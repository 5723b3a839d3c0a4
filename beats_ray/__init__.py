"""beats_ray — a Ray-Data-native rebuild of the Beats event pipeline.

Brand-new engine (NOT a port): harvester -> processor chain -> output routing
re-expressed as ray.data.Dataset pipelines of vectorized map_batches stages
over zero-copy Arrow batches.  See SURVEY.md for the blueprint and the
reference citations; the reference implementation lives at /root/reference
(elastic/beats fork, Go) and is used only to pin WHAT to compute.
"""

from . import stages  # noqa: F401  (registers all processors)
from . import functions  # noqa: F401  (registers training-data operators)
from .conditions import compile_condition  # noqa: F401
from .pipeline import Pipeline  # noqa: F401
from .routing import Selector  # noqa: F401

__version__ = "0.1.0"
