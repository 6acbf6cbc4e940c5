"""Delta hill climbing — greedy structure search that scales to link (n=724).

``search/hillclimb.py`` scores every move as a full candidate adjacency
([3n^2, n, n] tensors): ideal up to n ~ 70, hopeless at n = 724 (the
candidate tensor alone is O(n^4)).  This climber exploits the score's
decomposability the way classical BNSL engines do (bnlearn's ``hc`` with a
score cache): a single-edge move changes the family score of the CHILD
only (reversal: both endpoints), so the climber maintains

- ``fam[y]``         — current family score of node y,
- ``gain_add[x, y]`` — score(y | P_y ∪ {x}) − fam[y],
- ``gain_del[x, y]`` — score(y | P_y \\ {x}) − fam[y],

and after accepting a move re-scores only the changed children's columns
(O(n) families via ``scoring/family_batch.py``) instead of all O(n^2)
moves.  Acyclicity uses an incrementally-maintained transitive closure
(additions are an O(n^2) outer-product update; deletions/reversals
recompute the closure in one device call); reversal feasibility is checked
exactly on the winning candidate only (a reversal x->y is cyclic iff an
alternative x ~> y path exists, which no cheap incremental test covers).

Reference anchor: the reference has no search at all (SURVEY.md §0); its
scaling story is the catalog ladder up to link, ``README.md:39-44``.
"""

from __future__ import annotations

import numpy as np

from dags_vae_search_tpu.scoring.family_batch import FamilyBatchScorer
from dags_vae_search_tpu.search.hillclimb import HillClimbResult

NEG_INF = float("-inf")


def _closure_bool(adj: np.ndarray) -> np.ndarray:
    """Boolean transitive closure (paths of length >= 1), host-side.

    Squares a float32 reachability matrix through BLAS: numpy's bool matmul
    is a scalar C loop (no BLAS kernel), which at link scale (n=724) costs
    seconds per call — and this runs on every accepted deletion/reversal.
    float32 sgemm does the same n^3 work in milliseconds; counts saturate
    to 1.0 between squarings so the 2^k path-length doubling stays exact
    (values are only ever 0.0 or 1.0, so no float32 precision concerns).
    """
    reach = np.ascontiguousarray(adj, dtype=np.float32)
    np.minimum(reach, 1.0, out=reach)
    n = adj.shape[0]
    for _ in range(int(np.ceil(np.log2(max(n, 2))))):
        new = reach + reach @ reach
        np.minimum(new, 1.0, out=new)
        if np.array_equal(new, reach):
            break
        reach = new
    return reach > 0.0


def _parents_padded(adj_col: np.ndarray, width: int) -> np.ndarray:
    p = np.flatnonzero(adj_col).astype(np.int32)
    out = np.full(width, -1, np.int32)
    out[: p.size] = p
    return out


class _DeltaState:
    def __init__(
        self,
        fam: FamilyBatchScorer,
        adj: np.ndarray,
        max_parents: int,
        chunk: int,
    ):
        self.fam = fam
        self.n = adj.shape[0]
        self.width = max_parents + 1
        self.max_parents = max_parents
        self.chunk = chunk
        self.adj = adj.astype(bool)
        self.evals = 0
        # Wall-clock phase accounting (VERDICT r2 #6: the link climb ran at
        # 2.2k family-evals/s with no profile — these feed the report).
        self.t_score = 0.0
        self.t_closure = 0.0
        self.t_build = 0.0
        self.reach = self._timed_closure(self.adj)

        n = self.n
        base_parents = np.stack(
            [_parents_padded(self.adj[:, y], self.width) for y in range(n)]
        )
        self.fam_score = self._score(
            np.arange(n, dtype=np.int32), base_parents
        ).astype(np.float64)
        self.gain_add = np.full((n, n), NEG_INF)
        self.gain_del = np.full((n, n), NEG_INF)
        # One chunked pass over the whole O(n^2) move frontier (per-child
        # refreshes here would issue n separate dispatches before move 1).
        self._refresh_children(range(n))

    def _timed_closure(self, adj: np.ndarray) -> np.ndarray:
        import time as _time

        t0 = _time.perf_counter()
        out = _closure_bool(adj)
        self.t_closure += _time.perf_counter() - t0
        return out

    def _score(self, children, parents) -> np.ndarray:
        import time as _time

        self.evals += len(children)
        t0 = _time.perf_counter()
        out = self.fam.score_chunked(children, parents, chunk=self.chunk)
        self.t_score += _time.perf_counter() - t0
        return out

    def _refresh_children(self, ys) -> None:
        """Recompute gain_add/gain_del columns for several children in ONE
        batched scoring dispatch (the per-move dispatch is the climb's
        dominant cost through a remote device, so batch-accepted moves fold
        their refreshes together)."""
        import time as _time

        t0 = _time.perf_counter()
        n, w = self.n, self.width
        children = []
        parents = []
        slots = []  # (kind 0=add 1=del, x, y)
        for y in ys:
            cur = np.flatnonzero(self.adj[:, y]).astype(np.int32)
            k = cur.size
            if k < self.max_parents:
                for x in range(n):
                    if x == y or self.adj[x, y]:
                        continue
                    row = np.full(w, -1, np.int32)
                    row[:k] = cur
                    row[k] = x
                    children.append(y)
                    parents.append(row)
                    slots.append((0, x, y))
            for x in cur:
                row = np.full(w, -1, np.int32)
                rest = cur[cur != x]
                row[: rest.size] = rest
                children.append(y)
                parents.append(row)
                slots.append((1, int(x), y))
            self.gain_add[:, y] = NEG_INF
            self.gain_del[:, y] = NEG_INF
        self.t_build += _time.perf_counter() - t0
        if not children:
            return
        scores = self._score(
            np.asarray(children, np.int32), np.stack(parents)
        ).astype(np.float64)
        kinds, xs, ys_arr = np.asarray(slots, np.int64).T
        gains = scores - self.fam_score[ys_arr]
        is_add = kinds == 0
        self.gain_add[xs[is_add], ys_arr[is_add]] = gains[is_add]
        self.gain_del[xs[~is_add], ys_arr[~is_add]] = gains[~is_add]

    def _refresh_child(self, y: int) -> None:
        self._refresh_children([y])

    # ----------------------------------------------------------- moves

    def feasible_deltas(self):
        n = self.n
        indeg = self.adj.sum(0)
        no_edge = ~self.adj & ~self.adj.T & ~np.eye(n, dtype=bool)
        can_add = no_edge & ~self.reach.T & (indeg[None, :] < self.max_parents)
        add = np.where(can_add, self.gain_add, NEG_INF)
        dele = np.where(self.adj, self.gain_del, NEG_INF)
        # reversal x->y: child y loses x, child x gains y
        can_rev = self.adj & (self.adj.sum(0)[:, None] < self.max_parents)
        rev = np.where(can_rev, self.gain_del + self.gain_add.T, NEG_INF)
        return add, dele, rev

    def reversal_acyclic(self, x: int, y: int) -> bool:
        trial = self.adj.copy()
        trial[x, y] = False
        trial[y, x] = True
        reach = self._timed_closure(trial)
        return not bool(reach.diagonal().any())

    def profile(self) -> dict:
        return {
            "score_dispatch_s": round(self.t_score, 2),
            "closure_s": round(self.t_closure, 2),
            "candidate_build_s": round(self.t_build, 2),
        }

    def _apply_add(self, x: int, y: int) -> None:
        """Add x->y and update the closure incrementally (exact)."""
        self.fam_score[y] += self.gain_add[x, y]
        self.adj[x, y] = True
        # new paths u ~> x -> y ~> w
        col = self.reach[:, x].copy()
        col[x] = True
        row = self.reach[y, :].copy()
        row[y] = True
        self.reach |= np.outer(col, row)

    def _apply_del(self, x: int, y: int) -> None:
        """Delete x->y.  Leaves ``reach`` OVERSTATED (deletion can only
        remove paths) — conservative for acyclicity checks; the caller
        recomputes the exact closure once per accepted batch."""
        self.fam_score[y] += self.gain_del[x, y]
        self.adj[x, y] = False

    def apply(self, kind: str, x: int, y: int) -> None:
        if kind == "add":
            self._apply_add(x, y)
            self._refresh_child(y)
        elif kind == "del":
            self._apply_del(x, y)
            self.reach = self._timed_closure(self.adj)
            self._refresh_child(y)
        else:  # reversal x->y  =>  y->x
            self.fam_score[y] += self.gain_del[x, y]
            self.fam_score[x] += self.gain_add[y, x]
            self.adj[x, y] = False
            self.adj[y, x] = True
            self.reach = self._timed_closure(self.adj)
            self._refresh_children([y, x])

    def apply_batch(
        self, add: np.ndarray, dele: np.ndarray, limit: int,
        min_improvement: float,
    ) -> int:
        """Accept up to ``limit`` add/del moves for DISTINCT children in one
        pass, then refresh every touched child with ONE batched dispatch.

        Sound because family scores are per-child independent: each child's
        gain is exact regardless of what other children's moves do.  Cross-
        move acyclicity is preserved by re-checking each add against the
        incrementally-updated closure (adds keep it exact; deletions leave
        it overstated, which can only conservatively skip a legal add).
        Returns the number of accepted moves.
        """
        ga, gx = add.max(axis=0), add.argmax(axis=0)
        gd, dx = dele.max(axis=0), dele.argmax(axis=0)
        child_gain = np.maximum(ga, gd)
        order = np.argsort(-child_gain)[:limit]
        applied = []
        deleted = False
        for y in order:
            g = child_gain[y]
            if not np.isfinite(g) or g <= min_improvement:
                break
            y = int(y)
            if ga[y] >= gd[y]:
                x = int(gx[y])
                if self.reach[y, x]:  # x now reachable from y -> cycle
                    continue
                self._apply_add(x, y)
            else:
                self._apply_del(int(dx[y]), y)
                deleted = True
            applied.append(y)
        if deleted:
            self.reach = self._timed_closure(self.adj)
        if applied:
            self._refresh_children(applied)
        return len(applied)


def delta_hill_climb(
    fam: FamilyBatchScorer,
    num_variables: int,
    init_adj: np.ndarray | None = None,
    max_iters: int = 5000,
    min_improvement: float = 1e-4,
    chunk: int = 4096,
    time_budget_s: float | None = None,
    accept_batch: int = 1,
) -> HillClimbResult:
    """Greedy climb using cached family deltas.

    Same result contract as ``hillclimb.hill_climb``; ``num_evals`` counts
    family evaluations (each is one node-score, ~n-fold cheaper than a full
    candidate evaluation there).  ``time_budget_s`` makes the climb anytime:
    when the wall clock runs out it returns the best structure found so far
    (every accepted move only ever improves the score, so the incumbent is
    always valid) instead of risking an external timeout that loses the
    whole result at link scale (n=724, host loop per accepted move).

    ``accept_batch > 1`` accepts up to that many positive-gain moves for
    distinct children per frontier scan (see ``_DeltaState.apply_batch``) —
    the per-move refresh dispatch is the dominant cost through a remote
    device, and family-score decomposability makes multi-child acceptance
    exact.  Reversals still go one at a time (they need an exact
    alternative-path acyclicity check).
    """
    import time as _time

    deadline = (
        None if time_budget_s is None else _time.monotonic() + time_budget_s
    )
    n = num_variables
    adj0 = (
        np.zeros((n, n), bool)
        if init_adj is None
        else np.asarray(init_adj) > 0
    )
    state = _DeltaState(fam, adj0, fam.max_parents, chunk)
    history = [float(state.fam_score.sum())]

    def result(iters, converged):
        return HillClimbResult(
            best_score=float(state.fam_score.sum()),
            best_adj=state.adj.astype(np.float32),
            iterations=iters,
            num_evals=state.evals,
            history=history,
            converged=converged,
            profile=state.profile(),
        )

    moves = 0
    while moves < max_iters:
        if deadline is not None and _time.monotonic() > deadline:
            return result(moves, False)
        add, dele, rev = state.feasible_deltas()
        while True:
            deltas = np.stack(
                [add.max(initial=NEG_INF), dele.max(initial=NEG_INF),
                 rev.max(initial=NEG_INF)]
            )
            kind_i = int(np.argmax(deltas))
            best_delta = float(deltas[kind_i])
            if not np.isfinite(best_delta) or best_delta <= min_improvement:
                return result(moves, True)
            kind = ("add", "del", "rev")[kind_i]
            mat = (add, dele, rev)[kind_i]
            x, y = np.unravel_index(int(np.argmax(mat)), mat.shape)
            if kind == "rev" and not state.reversal_acyclic(int(x), int(y)):
                rev[x, y] = NEG_INF  # cyclic via an alternative path
                continue
            break
        if kind == "rev" or accept_batch <= 1:
            state.apply(kind, int(x), int(y))
            moves += 1
        else:
            moves += state.apply_batch(
                add, dele, min(accept_batch, max_iters - moves),
                min_improvement,
            )
        history.append(float(state.fam_score.sum()))

    return result(moves, False)
