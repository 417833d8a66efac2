from simple_data_workflow_spark.operators.strings import (  # noqa: F401
    clean_text,
    clean_text_col,
    sanitize_col_names,
    column_wrangler,
)
from simple_data_workflow_spark.operators.cleaning import (  # noqa: F401
    replace_na,
    obj_wrangler,
    check_model_assumptions,
    clean_data,
    validate,
    ValidationError,
)
from simple_data_workflow_spark.operators.joins import (  # noqa: F401
    asof_join,
    interval_join,
    salted_join,
)
from simple_data_workflow_spark.operators.cdc import (  # noqa: F401
    merge_upsert,
    scd2_apply,
)
from simple_data_workflow_spark.operators.categorical import (  # noqa: F401
    CategoryRegistry,
    attach_registry_metadata,
    factor_wrangler,
    encode_data,
    registry_from_schema,
)
from simple_data_workflow_spark.operators.transforms import (  # noqa: F401
    transform_data,
    gelman_standardize_data,
)
from simple_data_workflow_spark.operators.na import wrangle_na  # noqa: F401
from simple_data_workflow_spark.operators.model import (  # noqa: F401
    run_model,
    confidence_intervals,
)
from simple_data_workflow_spark.operators.themes import (  # noqa: F401
    ggplot2_theme,
    streamlit_theme,
)
