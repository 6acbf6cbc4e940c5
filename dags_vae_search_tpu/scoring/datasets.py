"""Discrete-dataset handling for decomposable-score evaluation.

The reference scores a candidate structure by spawning
``Rscript bnlearn_score.R <dataset> <metric> <adj>`` per graph
(``src/problem/bn/bnlearn.py:46-54``), where R loads its built-in dataset
(the same 5000 rows shipped as ``data/*/target.csv``).  Here the dataset is
integer-coded once into ``codes: int32[N_cases, n]`` (+ per-column
cardinalities) and lives in device memory; all scoring happens on-device.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np
import pandas as pd


class DiscreteDataset(NamedTuple):
    """Integer-coded discrete dataset.

    ``codes[c, i]`` is the level index of variable ``i`` in case ``c``;
    levels are sorted lexicographically per column, matching R's default
    factor-level ordering (the level order does not affect any score).
    """

    codes: np.ndarray  # int32[N_cases, n]
    cards: np.ndarray  # int32[n] — number of levels per variable
    columns: List[str]

    @property
    def num_cases(self) -> int:
        return self.codes.shape[0]

    @property
    def num_variables(self) -> int:
        return self.codes.shape[1]


def from_dataframe(df: pd.DataFrame) -> DiscreteDataset:
    codes = np.stack(
        [
            pd.Categorical(df[c], categories=sorted(df[c].unique())).codes
            for c in df.columns
        ],
        axis=1,
    ).astype(np.int32)
    cards = (codes.max(axis=0) + 1).astype(np.int32)
    return DiscreteDataset(codes=codes, cards=cards, columns=list(df.columns))


def load_target_csv(path: str, index_col: Optional[int] = None) -> DiscreteDataset:
    """Load a ``target.csv`` (R ``write.csv`` / pgmpy ``simulate`` output).

    Column order defines variable index order — label ``i`` of a candidate
    graph refers to column ``i``, exactly as the reference's adjacency
    string is interpreted against ``names(dataset)``
    (``bnlearn_score.R:29-36``).
    """
    df = pd.read_csv(path, index_col=index_col)
    # R write.csv emits an unnamed row-index column; drop it if present.
    first = df.columns[0]
    if first.startswith("Unnamed") or first == "":
        df = df.drop(columns=[first])
    return from_dataframe(df)
