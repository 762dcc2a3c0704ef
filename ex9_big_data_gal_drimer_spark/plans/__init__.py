"""Query plan registry — import side-effect registers all queries."""

from .registry import ORACLES, QUERIES, register  # noqa: F401

from . import queries_parity  # noqa: F401,E402
from . import queries_relational  # noqa: F401,E402
from . import queries_relational2  # noqa: F401,E402
from . import queries_relational3  # noqa: F401,E402
from . import queries_events  # noqa: F401,E402
from . import queries_llm  # noqa: F401,E402
from . import queries_llm_scale  # noqa: F401,E402
from . import queries_text2  # noqa: F401,E402
from . import queries_llm2  # noqa: F401,E402
from . import queries_asof  # noqa: F401,E402
from . import queries_range_rollup  # noqa: F401,E402
from . import queries_graph  # noqa: F401,E402
from . import queries_functions  # noqa: F401,E402
from . import queries_stats  # noqa: F401,E402
from . import queries_text3  # noqa: F401,E402
from . import queries_analytic  # noqa: F401,E402
from . import queries_curation  # noqa: F401,E402
