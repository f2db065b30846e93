"""Deterministic test fixtures (FIXTURES.md).

Two families:

1. A synthetic source-code repository table ``(repo, path, commit, lang,
   content)`` — the primary input shape per BASELINE.json ``input_hint``
   — whose import statements encode a known ground-truth edge list.
2. Named SNAP-style edge-list graphs mirroring what FOG's ``convert``
   consumes (reference: README.txt:25-33, tab-separated ``src\\tdst``),
   with deterministic weights replacing FOG's rand-in-[0,10) weights
   (reference: convert/process_adjlist.cpp:25-30).

Everything is a pure function of (seed, size): no RNG state leaks, no
wall clock, no external data.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

LANGS = ("python", "c", "cpp")
EXT = {"python": "py", "c": "h", "cpp": "h"}


def det_weight(src: np.ndarray | int, dst: np.ndarray | int) -> np.ndarray | float:
    """Deterministic edge weight in [1.0, 9.9] (FIXTURES.md §2)."""
    return ((np.asarray(src, dtype=np.int64) * 31 + np.asarray(dst, dtype=np.int64)) % 90 + 10) / 10.0


# ---------------------------------------------------------------------------
# 1. Synthetic repository table
# ---------------------------------------------------------------------------


def _imports_for(file_idx: int, n_files: int, regime: str, seed: int) -> list[int]:
    """Deterministic pseudo-random import targets for one file."""
    rng = np.random.default_rng(seed * 1_000_003 + file_idx)
    if regime == "power-law":
        targets: set[int] = set()
        # file 0 ("utils") is imported by ~80% of files: hub/skew stressor
        if file_idx != 0 and rng.random() < 0.8:
            targets.add(0)
        d = int(rng.integers(0, 4))
        targets.update(int(t) for t in rng.integers(0, n_files, size=d) if t != file_idx)
        return sorted(targets)
    d = int(rng.integers(0, 6))
    return sorted({int(t) for t in rng.integers(0, n_files, size=d) if t != file_idx})


def make_repo_table(
    n_repos: int = 2, files_per_repo: int = 16, regime: str = "uniform", seed: int = 42
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Build the repos fixture and its ground-truth edge list.

    Returns (repos_df, truth_edges_df) where truth_edges has columns
    (repo, src_path, dst_path) — the exact edge set the derivation UDF
    must recover.
    """
    rows, truth = [], []
    for k in range(n_repos):
        repo = f"repo{k:03d}"
        langs = [LANGS[i % 3] for i in range(files_per_repo)]
        for i in range(files_per_repo):
            lang = langs[i]
            path = f"src/mod{i:04d}.{EXT[lang]}"
            imports = _imports_for(k * files_per_repo + i, files_per_repo, regime, seed)
            lines = [f"// module mod{i:04d}" if lang != "python" else f"# module mod{i:04d}"]
            for t in imports:
                tgt_lang = langs[t]
                if lang == "python":
                    # python files can only import python modules
                    if tgt_lang != "python":
                        continue
                    stmt = f"import mod{t:04d}" if (i + t) % 2 == 0 else f"from mod{t:04d} import x"
                    dst_path = f"src/mod{t:04d}.py"
                else:
                    if tgt_lang == "python":
                        continue
                    stmt = f'#include "mod{t:04d}.h"'
                    dst_path = f"src/mod{t:04d}.h"
                lines.append(stmt)
                truth.append((repo, path, dst_path))
            lines += [f"filler_{j} = {j}" if lang == "python" else f"int filler_{j} = {j};" for j in range(3)]
            content = "\n".join(lines) + "\n"
            commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
            rows.append((repo, path, commit, lang, content))
    repos = pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    truth_df = pd.DataFrame(truth, columns=["repo", "src_path", "dst_path"]).drop_duplicates()
    return repos, truth_df


# ---------------------------------------------------------------------------
# 2. Named edge-list graphs (golden-oracle targets)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Graph:
    name: str
    edges: np.ndarray  # (m, 2) int64 [src, dst]
    n: int  # vertex-id upper bound (ids are 0..n-1; some may be isolated)

    def weights(self) -> np.ndarray:
        return np.asarray(det_weight(self.edges[:, 0], self.edges[:, 1]), dtype=np.float64)

    def to_pandas(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": self.edges[:, 0].astype(np.int64),
                "dst": self.edges[:, 1].astype(np.int64),
                "weight": self.weights(),
            }
        )


def _g(name: str, pairs: list[tuple[int, int]], n: int | None = None) -> Graph:
    e = np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
    return Graph(name, e, n if n is not None else int(e.max()) + 1)


def make_er_graph(n: int = 100, p: float = 0.05, seed: int = 42) -> Graph:
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    src, dst = np.nonzero(mask)
    return Graph(f"g_er_n{n}", np.stack([src, dst], axis=1).astype(np.int64), n)


def make_plaw_graph(n: int = 1000, m_attach: int = 3, seed: int = 42) -> Graph:
    """Barabási-style preferential attachment (directed new->old)."""
    rng = np.random.default_rng(seed)
    edges: list[tuple[int, int]] = [(1, 0), (2, 0), (2, 1)]
    degree = np.zeros(n, dtype=np.int64)
    degree[0], degree[1], degree[2] = 3, 2, 1
    for v in range(3, n):
        probs = degree[:v] / degree[:v].sum()
        targets = rng.choice(v, size=min(m_attach, v), replace=False, p=probs)
        for t in targets:
            edges.append((v, int(t)))
            degree[t] += 1
            degree[v] += 1
    return Graph(f"g_plaw_n{n}", np.asarray(edges, dtype=np.int64), n)


def named_graphs() -> dict[str, Graph]:
    """The FIXTURES.md §2 graph zoo."""
    gs = [
        _g("g_line", [(0, 1), (1, 2), (2, 3), (3, 4)]),
        _g("g_cycle", [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]),
        _g("g_selfloop", [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 1), (3, 3)]),
        _g("g_two_comp", [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)], n=7),
        _g("g_dag", [(0, 1), (0, 2), (1, 3), (2, 3)]),
        _g("g_star_in", [(i, 50) for i in range(50)], n=51),
        _g("g_star_out", [(50, i) for i in range(50)], n=51),
        _g("g_tri", [(a, b) for a in range(4) for b in range(4) if a < b]),  # K4: 4 triangles
        make_er_graph(),
        make_plaw_graph(),
    ]
    return {g.name: g for g in gs}


def graph_to_spark(spark, g: Graph):
    """Edge-list Graph -> Spark DataFrame (src long, dst long, weight double)."""
    return spark.createDataFrame(g.to_pandas())
