from .asof import asof_join  # noqa: F401
from .dedup import dedup_exact  # noqa: F401
from .pivot import pivot_wide  # noqa: F401
from .relational import broadcast_dim_join, semi_join, anti_join  # noqa: F401
from .topk import top_k, top_k_per_group  # noqa: F401
