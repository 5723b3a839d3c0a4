"""Training-data operator library: text stats, dedup, similarity, multimodal.
Importing registers the stage-style operators in the processor registry."""

from . import dedup  # noqa: F401
from . import multimodal  # noqa: F401
from . import sampling  # noqa: F401
from . import similarity  # noqa: F401
from . import textstats  # noqa: F401
