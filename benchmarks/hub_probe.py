"""Hub-path variants for the hybrid window gather: the hub tail is
~0.4 ms of the 2.5 ms bench step.  Candidates: scatter-back instead of
the (S,)-row gather-back, right-sized hub capacity, and a single
combined gather (window lines + hub entry lines ride one ramp).

    timeout 580 python -m benchmarks.hub_probe
"""

import time

import numpy as np

from bench import BATCH, DEG_ALPHA, DEG_CAP, DEG_SCALE, FANOUTS, NUM_NODES

REPS = 20
OUTER = 20
S2 = BATCH * (FANOUTS[0] + 1)


def log(msg):
    print(f"[hub] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.sample import floyd_positions
    from cugraph_gnn_tpu.ops.window_gather import (
        LINE,
        gather_csr_values,
        gather_lines_per_entry,
    )

    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    num_edges_pad = -(-int(indptr_np[-1]) // 128) * 128
    indptr = jnp.asarray(indptr_np)
    k = FANOUTS[0]
    LINES = 2

    @jax.jit
    def make_data():
        return jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, NUM_NODES, jnp.int32)

    indices = jax.block_until_ready(make_data())
    log(f"data ready (hub frac deg>{2*128-127}: "
        f"{(deg > 2*128-127).mean():.4f})")

    def scanner(step_fn, n=REPS):
        @jax.jit
        def run(acc, key, *arrays):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                return step_fn(carry, kk, *arrays), None
            acc, _ = jax.lax.scan(body, acc, jnp.arange(n, dtype=jnp.int32))
            return acc
        return run

    def prefix(kk, indptr):
        seeds = jax.random.randint(kk, (S2,), 0, NUM_NODES, jnp.int32)
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        u = jax.random.uniform(kk, (S2, k))
        pos = floyd_positions(u, d, k)
        return start, d, pos

    # -- variant bodies -----------------------------------------------------

    def hub_compact_scatter(values2d, start, pos, hub, h):
        s, kk_ = pos.shape
        row_of_slot = jnp.nonzero(hub, size=h,
                                  fill_value=s)[0].astype(jnp.int32)
        n_hub = jnp.sum(hub.astype(jnp.int32))
        safe_row = jnp.minimum(row_of_slot, s - 1)
        bstart = start[safe_row]
        live = (jnp.arange(h, dtype=jnp.int32) < n_hub)[:, None]
        bpos = jnp.where(live, pos[safe_row], -1)
        bvals = gather_lines_per_entry(
            values2d, jnp.where(bpos >= 0, bstart[:, None] + bpos, -1))
        return jnp.zeros((s, kk_), bvals.dtype).at[row_of_slot].set(
            jnp.where(live, bvals, 0), mode="drop")

    def hybrid_scatterback(values2d, start, pos, d, h):
        s = start.shape[0]
        cap = LINES * LINE - (LINE - 1)
        hub = d > cap
        small = (~hub)[:, None]
        from cugraph_gnn_tpu.ops.window_gather import gather_window
        out_small = gather_window(values2d, start,
                                  jnp.where(small, pos, -1), lines=LINES)
        out_big = hub_compact_scatter(values2d, start,
                                      jnp.where(small, -1, pos), hub, h)
        return jnp.where(small, out_small, out_big)

    def hybrid_combined(values2d, start, pos, d, h):
        s, kk_ = pos.shape
        nl = values2d.shape[0]
        cap = LINES * LINE - (LINE - 1)
        hub = d > cap
        small = (~hub)[:, None]
        line0 = start // LINE
        win_idx = jnp.minimum(
            line0[:, None] + jnp.arange(LINES, dtype=start.dtype), nl - 1)
        row_of_slot = jnp.nonzero(hub, size=h,
                                  fill_value=s)[0].astype(jnp.int32)
        n_hub = jnp.sum(hub.astype(jnp.int32))
        safe_row = jnp.minimum(row_of_slot, s - 1)
        bstart = start[safe_row]
        live = (jnp.arange(h, dtype=jnp.int32) < n_hub)[:, None]
        bpos = jnp.where(live & (pos[safe_row] >= 0), pos[safe_row], -1)
        beid = jnp.where(bpos >= 0, bstart[:, None] + bpos, 0)
        bline = jnp.minimum(beid // LINE, nl - 1)
        allidx = jnp.concatenate([win_idx.reshape(-1), bline.reshape(-1)])
        rows = values2d[allidx]
        w = rows[: s * LINES].reshape(s, LINES, LINE)
        brows = rows[s * LINES:].reshape(h, kk_, LINE)
        off = (start % LINE)[:, None] + pos
        valid = (pos >= 0) & small
        li = off // LINE
        lane = off % LINE
        wsel = jnp.zeros((s, kk_, LINE), w.dtype)
        for l in range(LINES):
            wsel = jnp.where((li == l)[:, :, None], w[:, None, l, :], wsel)
        j = jnp.arange(LINE, dtype=jnp.int32)
        oh = (lane[..., None] == j) & valid[..., None]
        out_small = jnp.sum(jnp.where(oh, wsel, 0), axis=2)
        blane = beid % LINE
        boh = (blane[..., None] == j) & (bpos[..., None] >= 0)
        bvals = jnp.sum(jnp.where(boh, brows, 0), axis=-1)
        out = jnp.where(small, out_small, 0)
        return out.at[row_of_slot].set(jnp.where(live, bvals, 0),
                                       mode="drop")

    # -- probes ---------------------------------------------------------------

    def p_current(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = gather_csr_values(indices.reshape(-1, 128), start, pos,
                                degrees=d, max_degree=max_degree,
                                max_window_lines=2)
        return acc + jnp.sum(nbr)

    def p_cap768(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = gather_csr_values(indices.reshape(-1, 128), start, pos,
                                degrees=d, max_degree=max_degree,
                                max_window_lines=2, hub_capacity=768)
        return acc + jnp.sum(nbr)

    def p_scatterback(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = hybrid_scatterback(indices.reshape(-1, 128), start, pos, d,
                                 768)
        return acc + jnp.sum(nbr)

    def p_combined(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = hybrid_combined(indices.reshape(-1, 128), start, pos, d, 768)
        return acc + jnp.sum(nbr)

    def p_combined_1408(acc, kk, indptr, indices):
        start, d, pos = prefix(kk, indptr)
        nbr = hybrid_combined(indices.reshape(-1, 128), start, pos, d,
                              1408)
        return acc + jnp.sum(nbr)

    key = jax.random.PRNGKey(9)

    def timed(name, run, arrays):
        nonlocal key

        def loop(n):
            nonlocal key
            acc = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                acc = run(acc, sk, *arrays)
            return int(acc)

        loop(1)
        t0 = time.perf_counter(); loop(1); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(OUTER + 1)
        dt = max(time.perf_counter() - t0 - t_s, 1e-9)
        log(f"{name}: {1e3 * dt / (OUTER * REPS):.3f} ms/step")

    timed("current hybrid2 (cap S//8) ", scanner(p_current),
          (indptr, indices))
    timed("hybrid2 cap=768            ", scanner(p_cap768),
          (indptr, indices))
    timed("scatter-back cap=768       ", scanner(p_scatterback),
          (indptr, indices))
    timed("combined gather cap=768    ", scanner(p_combined),
          (indptr, indices))
    timed("combined gather cap=1408   ", scanner(p_combined_1408),
          (indptr, indices))

    # correctness spot-check vs the current path (CPU interpretable math,
    # run on device): same inputs -> same outputs
    kk = jax.random.PRNGKey(3)
    start, d, pos = prefix(kk, indptr)
    ref = gather_csr_values(indices.reshape(-1, 128), start, pos,
                            degrees=d, max_degree=max_degree,
                            max_window_lines=2)
    got1 = hybrid_scatterback(indices.reshape(-1, 128), start, pos, d, 768)
    got2 = hybrid_combined(indices.reshape(-1, 128), start, pos, d, 768)
    ok1 = bool(jnp.all(jnp.where(pos >= 0, got1 == ref, True)))
    ok2 = bool(jnp.all(jnp.where(pos >= 0, got2 == ref, True)))
    log(f"correctness: scatterback={ok1} combined={ok2}")


if __name__ == "__main__":
    main()
