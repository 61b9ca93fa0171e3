"""Query plan registry — importing this package populates REGISTRY."""

from .registry import REGISTRY, QuerySpec, register  # noqa: F401

from . import relational  # noqa: F401,E402
from . import windows_sets  # noqa: F401,E402
from . import streaming_batch  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import udfs  # noqa: F401,E402
