"""Pipelines: medallion builds, the 100+ query catalog, the distributed
model tail (prep → train → registry/promotion), DAG orchestration and the
bench harness."""

from raylake.pipelines.dag import (  # noqa: F401
    Dag,
    DagRun,
    Job,
)
from raylake.pipelines.ml_train import (  # noqa: F401
    predict_logreg,
    train_logreg,
)
from raylake.pipelines.registry import (  # noqa: F401
    ModelRegistry,
    macro_f1_counts,
)
