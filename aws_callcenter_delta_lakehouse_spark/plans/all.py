"""Import every query module so the registry is fully populated."""

from . import advanced  # noqa: F401
from . import athena  # noqa: F401
from . import callcenter  # noqa: F401
from . import delta_facade  # noqa: F401
from . import formats  # noqa: F401
from . import llm  # noqa: F401
from . import llm2  # noqa: F401
from . import llm3  # noqa: F401
from . import llm4  # noqa: F401
from . import llm5  # noqa: F401
from . import llm6  # noqa: F401
from . import llm7  # noqa: F401
from . import llm8  # noqa: F401
from . import llm9  # noqa: F401
from . import llm10  # noqa: F401
from . import llm11  # noqa: F401
from . import llm12  # noqa: F401
from . import llm13  # noqa: F401
from . import llm14  # noqa: F401
from . import llm15  # noqa: F401
from . import llm16  # noqa: F401
from . import llm17  # noqa: F401
from . import llm18  # noqa: F401
from . import llm19  # noqa: F401
from . import llm20  # noqa: F401
from . import llm21  # noqa: F401
from . import llm22  # noqa: F401
from . import relational  # noqa: F401
from . import relational2  # noqa: F401
from . import relational3  # noqa: F401
from . import relational4  # noqa: F401
from . import relational5  # noqa: F401
from . import scale  # noqa: F401
from . import scd2_queries  # noqa: F401
from . import spark4  # noqa: F401
from . import stats_queries  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import timeseries_queries  # noqa: F401
from . import tpch  # noqa: F401
from . import tpch2  # noqa: F401
from . import tpch3  # noqa: F401

from .registry import REGISTRY  # noqa: F401  (re-export)
