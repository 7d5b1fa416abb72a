"""Exact linear-sum assignment ON DEVICE — jit-native Jonker-Volgenant.

The reference's Mask2Former assigner calls scipy's linear_sum_assignment on
the host every train step (/root/reference/dinov2/eval/segmentation_m2f/models/utils/assigner.py:46-157),
which in JAX means a jax.pure_callback — a device→host→device round trip per
step that some PJRT backends (this image's axon TPU tunnel among them) do not
support at all. This module solves the assignment inside the XLA program:

  * shape: cost (Q, G) with G ≤ Q (100 queries × ≤max_segments gt instances);
    G is tiny, so the O(G²·Q) shortest-augmenting-path LAPJV is microseconds
    of VPU work — far below one host round trip.
  * algorithm: for each gt column (an LAPJV "row") run Dijkstra on reduced
    costs over the Q queries — each scan permanently labels one column and
    only already-assigned columns extend the path, so G scans always reach a
    free column — then augment along predecessors and update the duals.
    Every loop is a lax loop with static bound G: ONE small compiled graph
    for any G (rounds of the earlier Python-unrolled form compiled O(G²)
    graphs and took seconds per shape to trace).
  * exactness: identical total cost to scipy for any finite cost matrix
    (assignments may differ on exact ties; tests assert cost equality and
    one-to-one validity on random and padded matrices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _lapjv_single(cost_t: jax.Array) -> jax.Array:
    """cost_t: (G, Q) f32, G ≤ Q static. Returns y (G,) int32 — the query
    assigned to each gt row — minimizing the total cost."""
    G, Q = cost_t.shape
    # row reduction (assignment-invariant): the m2f loss pads invalid gt
    # slots as CONSTANT-1e6 rows; subtracting each row's min removes that
    # constant from the problem exactly (a constant row becomes all-zero),
    # keeping every dual/distance at the real costs' O(1) scale. Without it,
    # f32 mixes O(1) cost differences with 1e6 offsets (ulp(1e6) = 0.0625)
    # and the matcher measured ±0.1 off scipy's f64 optimum.
    cost_t = cost_t - jnp.min(cost_t, axis=1, keepdims=True)

    def add_row(r, carry):
        v, x, y = carry
        cr = jnp.take(cost_t, r, axis=0)

        def scan_step(_, st):
            dist, pred, visited, jfree, delta = st

            def expand(st):
                dist, pred, visited, jfree, delta = st
                masked = jnp.where(visited, _INF, dist)
                j = jnp.argmin(masked).astype(jnp.int32)
                dj = masked[j]
                visited = visited.at[j].set(True)
                i = x[j]

                def hit_free(_):
                    return dist, pred, j, dj

                def relax(_):
                    # u_i from complementary slackness on (i, y[i]).
                    # Associativity matters in f32: (ci − v) first — for the
                    # m2f loss's 1e6-padded columns ci and v are equal-scale
                    # (Sterbenz-exact subtraction), while `dj + ci − …` adds
                    # an O(1) value to 1e6 and loses the real cost
                    # differences (ulp(1e6) = 0.0625 — measured as ±0.1
                    # "suboptimality" before this ordering).
                    yi = y[i]
                    ci = jnp.take(cost_t, i, axis=0)
                    u_i = ci[yi] - v[yi]
                    nd = (ci - v) + (dj - u_i)
                    upd = (~visited) & (nd < dist)
                    return (jnp.where(upd, nd, dist),
                            jnp.where(upd, i, pred), jfree, delta)

                dist, pred, jfree, delta = jax.lax.cond(i < 0, hit_free,
                                                        relax, None)
                return dist, pred, visited, jfree, delta

            return jax.lax.cond(jfree < 0, expand, lambda s: s, st)

        dist, pred, visited, jfree, delta = jax.lax.fori_loop(
            0, r + 1, scan_step,
            (cr - v, jnp.full((Q,), r, jnp.int32), jnp.zeros((Q,), bool),
             jnp.int32(-1), jnp.float32(0.0)))
        # dual update on the scanned set (free column's dist == delta: no-op)
        v = jnp.where(visited, v + dist - delta, v)

        # augment: walk predecessors back to row r
        def aug_step(_, st):
            j, x_, y_, active = st

            def do(st):
                j, x_, y_, _ = st
                i = pred[j]
                jn = y_[i]
                y_ = y_.at[i].set(j)
                x_ = x_.at[j].set(i)
                return jn, x_, y_, i != r

            return jax.lax.cond(active, do, lambda s: s, st)

        _, x, y, _ = jax.lax.fori_loop(0, r + 1, aug_step,
                                       (jfree, x, y, True))
        return v, x, y

    # NOTE: v must start at ZERO. The classic LAPJV column-reduction start
    # (v0 = per-column min) additionally GREEDILY PRE-ASSIGNS each column's
    # argmin row; taking the dual shift without those assignments breaks the
    # algorithm's invariants (measured: 60/60 random cases suboptimal, worst
    # +66 on O(10) costs). Zero duals + pure SAP is exact.
    v0 = jnp.zeros((Q,), jnp.float32)           # column (query) duals
    x0 = jnp.full((Q,), -1, jnp.int32)          # query -> gt row (-1 free)
    y0 = jnp.full((G,), -1, jnp.int32)          # gt row -> query
    _, _, y = jax.lax.fori_loop(0, G, add_row, (v0, x0, y0))
    return y


def lapjv_impl(cost: jax.Array) -> jax.Array:
    """(B, Q, G) cost, G ≤ Q → (B, 2, G) int32: [query index, gt index] pairs
    (the scipy linear_sum_assignment contract hungarian_match promises, pair
    order by gt slot).

    This is the UNWRAPPED implementation: call it from code that is already
    inside jax.jit (the m2f train/eval losses). Eager callers use `lapjv`.
    Keeping the two entry points separate matters on this image's XLA:CPU
    runtime: a jit wrapper that is BOTH inlined during another jit's trace AND
    then called eagerly corrupts the C++ dispatch fastpath — the second eager
    same-shape call dies with "Execution supplied 1 buffers but compiled
    program expected 2 buffers" (deterministic; round-5 probes — trivial
    programs are immune, this solver's fori/cond nest is not)."""
    B, Q, G = cost.shape
    if G > Q:
        raise ValueError(f"need G <= Q, got Q={Q}, G={G}")
    y = jax.vmap(_lapjv_single)(
        jnp.swapaxes(cost.astype(jnp.float32), 1, 2))      # (B, G)
    g = jnp.broadcast_to(jnp.arange(G, dtype=jnp.int32)[None], (B, G))
    return jnp.stack([y, g], axis=1)


# eager/public entry: one shared wrapper (never create fresh jax.jit(lapjv)
# wrappers per call — see lapjv_impl's note)
lapjv = jax.jit(lapjv_impl)
