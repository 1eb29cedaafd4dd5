"""MovieLens-shaped temporal bipartite recommendation.

ref python/cugraph-pyg/cugraph_pyg/examples/movielens_mnmg.py: user/movie
bipartite graph with per-edge TIMES on both orientations, positives =
high-rating edges, temporal link prediction (only edges no later than
the seed edge's time are sampled), binary negatives, dot-product
decoder.

Exercises the hetero + temporal + link-seeded combination:
``time_attr`` pulls per-edge times for every edge type and
``edge_label_time`` gives each seed edge its timestamp.

Usage:
    python examples/movielens_rec.py --epochs 5
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    from cugraph_gnn_tpu.utils.config import (
        add_model_options,
        add_sampler_options,
        add_training_options,
        make_parser,
        parse_fanouts,
    )
    p = make_parser(add_training_options, add_model_options,
                    add_sampler_options)
    p.add_argument("--num-users", type=int, default=600)
    p.add_argument("--num-movies", type=int, default=900)
    p.add_argument("--num-ratings", type=int, default=8000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import LinkNeighborLoader
    from cugraph_gnn_tpu.models import RGCN

    rng = np.random.default_rng(0)
    n_u, n_m, n_r = args.num_users, args.num_movies, args.num_ratings

    # synthetic taste clusters: users in cluster c mostly rate movies in
    # cluster c highly; ratings carry timestamps
    n_c = 6
    u_c = rng.integers(0, n_c, n_u)
    m_c = rng.integers(0, n_c, n_m)
    src = rng.integers(0, n_u, n_r)
    dst = rng.integers(0, n_m, n_r)
    match = u_c[src] == m_c[dst]
    rating = np.where(match, rng.integers(4, 6, n_r),
                      rng.integers(1, 4, n_r)).astype(np.int32)
    time = rng.integers(0, 1000, n_r).astype(np.int32)

    et = ("user", "rates", "movie")
    ret = ("movie", "rev_rates", "user")
    gs = GraphStore()
    gs.put_edge_index((src, dst), et, num_nodes=(n_u, n_m))
    gs.put_edge_index((dst, src), ret, num_nodes=(n_m, n_u))
    fs = FeatureStore()
    fs[("user", "x")] = rng.standard_normal((n_u, 16)).astype(np.float32)
    fs[("movie", "x")] = rng.standard_normal((n_m, 16)).astype(np.float32)
    # per-edge times for BOTH orientations (ref movielens_mnmg.py:111-115)
    fs[("user__rates__movie", "t")] = time
    fs[("movie__rev_rates__user", "t")] = time

    # positives = high ratings (ref :124-128 "only use edges with high
    # ratings"); their timestamps drive the temporal constraint
    hi = rating >= 4
    eli = np.stack([src[hi], dst[hi]])
    elt = time[hi]

    fanouts = parse_fanouts(args.neighbors)
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=fanouts,
        edge_label_index=(et, eli), neg_sampling="binary",
        batch_size=args.batch_size, shuffle=True,
        time_attr="t", edge_label_time=elt)

    g = gs.finalize()
    etype_names = ["__".join(e) for e in g.etypes]
    model = RGCN(num_relations=len(etype_names),
                 hidden_features=args.hidden_dim,
                 out_features=args.hidden_dim, num_layers=len(fanouts))

    def to_rel_batches(sample):
        return [[(hop[en].neigh_local, hop[en].mask) if en in hop else None
                 for en in etype_names]
                for hop in reversed(sample.hops)]

    def input_features(x_dict):
        total = None
        for x in x_dict.values():
            total = x if total is None else total + x
        return total

    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), input_features(b0.x),
                        to_rel_batches(b0.sample))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, rel_batches, eli_b, lab, seeds):
        def loss_fn(p):
            z = model.apply(p, x, rel_batches)
            score = jnp.sum(z[eli_b[0]] * z[eli_b[1]], axis=-1)
            valid = (seeds[eli_b[0]] >= 0) & (seeds[eli_b[1]] >= 0)
            ls = optax.sigmoid_binary_cross_entropy(score, lab)
            loss = jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
            acc = jnp.sum(jnp.where(
                valid, ((score > 0) == (lab > 0.5)).astype(jnp.float32),
                0)) / jnp.maximum(jnp.sum(valid), 1)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss, acc

    for epoch in range(args.epochs):
        tot = acc_tot = nb = 0.0
        for b in loader:
            params, opt, loss, acc = step(
                params, opt, input_features(b.x), to_rel_batches(b.sample),
                b.edge_label_index, b.edge_label, b.seeds)
            tot += float(loss)
            acc_tot += float(acc)
            nb += 1
        print(f"epoch {epoch}: loss {tot / max(nb, 1):.4f} "
              f"acc {acc_tot / max(nb, 1):.3f}")


if __name__ == "__main__":
    main()
