from raylake.stages.joins import (  # noqa: F401
    BloomKeyFilter,
    BroadcastLookup,
    KeySetFilter,
    bucket_join,
)
from raylake.stages.funnel import Stage, funnel_counts, funnel_flags  # noqa: F401
