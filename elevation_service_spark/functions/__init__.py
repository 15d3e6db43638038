from .keys import (  # noqa: F401
    cell_id_col,
    mercator_x_col,
    mercator_y_col,
    skadi_key_col,
    valid_coord_predicate,
)
