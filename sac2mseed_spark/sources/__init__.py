from .tables import load_table, register_views  # noqa: F401
from .transcripts import FIXTURES, generate_transcripts, transcripts_from_events  # noqa: F401
