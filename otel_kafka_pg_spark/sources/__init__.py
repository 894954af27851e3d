from .synth import (  # noqa: F401
    load_or_synth_transcripts,
    service_lookup_pandas,
    synth_service_lookup,
    synth_transcripts_pandas,
)
from .tables import load_table, register_testdata_views  # noqa: F401
