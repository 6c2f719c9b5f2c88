"""comet_spark — a PySpark-native hybrid search & analytics engine.

Re-expresses the query surface of the reference engine (wizenheimer/comet:
vector k-NN over flat/IVF/PQ/IVFPQ layouts, BM25 full-text, metadata
filtering, score fusion, LSM-style persistence) as idiomatic Spark
DataFrame plans, plus the large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) such an
engine needs at 100 TB.

Design rules (see SURVEY.md §4 and SCALE.md):
- declare plans with DataFrame/SQL; let Catalyst pick physical strategy
- distance math as native Catalyst array expressions (zip_with/aggregate),
  never row-at-a-time Python
- top-k is ORDER BY + LIMIT (TakeOrderedAndProject) or a window with
  rank-limit pushdown for per-group top-k
- small sides broadcast; prefilters pushed below scans
"""

from comet_spark.operators.ann import IVFIndex, IVFPQIndex, PQIndex
from comet_spark.operators.hnsw import HNSWIndex
from comet_spark.operators.scalar_quant import ScalarQuantizedIndex
from comet_spark.pipeline import CurationPipeline
from comet_spark.plans.builder import Corpus, HybridSearch, TextSearch, VectorSearch
from comet_spark.session import get_spark, load_tables
from comet_spark.storage.store import DocumentStore

__all__ = [
    "get_spark",
    "load_tables",
    "Corpus",
    "VectorSearch",
    "TextSearch",
    "HybridSearch",
    "CurationPipeline",
    "DocumentStore",
    "IVFIndex",
    "PQIndex",
    "IVFPQIndex",
    "HNSWIndex",
    "ScalarQuantizedIndex",
]
