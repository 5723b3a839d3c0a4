"""Stage registry — importing this package registers all built-in processors
(the analogue of Beats' init()-time RegisterPlugin calls,
libbeat/processors/registry.go)."""

from .base import FnStage, Stage, register, registered_stages, stage_factory  # noqa: F401
from . import actions  # noqa: F401
from . import auditd  # noqa: F401
from . import cef  # noqa: F401
from . import decode  # noqa: F401
from . import dissect  # noqa: F401
from . import enrich  # noqa: F401
from . import es_compat  # noqa: F401
from . import fingerprint  # noqa: F401
from . import grok  # noqa: F401
from . import flow  # noqa: F401
from . import network  # noqa: F401
from . import syslog  # noqa: F401
from . import timestamp  # noqa: F401
from . import vpcflow  # noqa: F401
from ..sources import readers as _readers  # noqa: F401  (reader-chain stages)
