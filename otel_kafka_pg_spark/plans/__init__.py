from .manifest import content_hash, load_manifest, partition_lineage, save_manifest  # noqa: F401
from .pipeline import build_routed, run_pipeline  # noqa: F401
