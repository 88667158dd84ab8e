"""Evaluation / benchmark subsystem.

Counterpart of the reference's ``morphem/`` package (the bundled MorphEm
CHAMMI benchmark): ``run_benchmark`` (``morphem/benchmark.py:31``),
``evaluate`` (``morphem/evaluation.py:101``) and the FAISS 1-NN
(``morphem/utils.py:8-46``) — the latter replaced by a sharded JAX
matmul + top-k that is exact, streams queries in fixed-size blocks, and
runs on the TPU it just trained on (no GPU FAISS dependency).
"""

from .knn import KNeighbors
from .benchmark import evaluate, run_benchmark
from .metrics import classification_report_dict, macro_f1

__all__ = [
    "KNeighbors",
    "evaluate",
    "run_benchmark",
    "classification_report_dict",
    "macro_f1",
]
