"""spark-elevation: PySpark-native batch elevation-enrichment engine.

Capabilities of perliedman/elevation-service, rebuilt Spark-first.
See SURVEY.md for the blueprint and reference-parity citations.
"""

__version__ = "0.1.0"
