"""End-to-end pipeline orchestration (reference E1/E2/E3 surfaces).

The reference's entry points — ``run_pipeline.py`` →
``Processor.run_pipeline`` (``src/pipeline/processor.py:87-113``), the
reusable ``preprocess_dataset`` block (``processor.py:56-85``) and the
EDA surface (``processor.py:21-54``) — re-expressed as lazy Spark plans.
The known reference defects (SURVEY.md header) are fixed, not ported:
the configured ``imbalance_strategy`` is honored (the reference always
ran the undersampler), loaders iterate the passed path dict, and the
clean E2 API shape is the one canonical code path.
"""

from .features import engineer_fraud_features  # noqa: F401
from .processor import Processor, TrainTestBundle  # noqa: F401
