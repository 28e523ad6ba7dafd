from .dates import (  # noqa: F401
    date_parts,
    parse_char_date,
    sas_date_to_date,
    date_to_sas_day,
)
from .strings import token_count, tokens  # noqa: F401
