"""Heterogeneous distributed training over a device mesh — the analog
of the reference's taobao_mnmg.py (hetero SAGE, multi-GPU): raw-id
knowledge graph -> renumber -> GraphStore/FeatureStore ->
DistNeighborLoader (typed seeds, per-type sharded features) -> per-type
SAGE-style aggregation -> pmap-free SPMD training via the loader's
single jitted shard_map step.

Run:  python examples/hetero_dist_training.py   (8-device CPU mesh or TPU)
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import DistNeighborLoader
    from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
    from cugraph_gnn_tpu.utils.renumber import renumber_kg

    rng = np.random.default_rng(0)
    n_user, n_item, f = 192, 128, 32

    # -- raw-id edge shards (hashed ids, taobao-style) -> renumber -----
    raw_user = rng.choice(10**9, n_user, replace=False)
    raw_item = rng.choice(10**9, n_item, replace=False)
    clicks_raw = (raw_user[rng.integers(0, n_user, 1200)],
                  raw_item[rng.integers(0, n_item, 1200)])
    kg = renumber_kg(
        nodes_by_type={"user": [raw_user], "item": [raw_item]},
        edges_by_etype={("user", "clicks", "item"): [clicks_raw]})
    src, dst = kg.edges[("user", "clicks", "item")]

    gs = GraphStore()
    gs.put_edge_index((src, dst), ("user", "clicks", "item"),
                      num_nodes=(n_user, n_item))
    gs.put_edge_index((dst, src), ("item", "rev_clicks", "user"),
                      num_nodes=(n_item, n_user))
    fs = FeatureStore()
    fs[("user", "x")] = rng.standard_normal((n_user, f)).astype(np.float32)
    fs[("item", "x")] = rng.standard_normal((n_item, f)).astype(np.float32)
    item_label = (np.arange(n_item) % 4).astype(np.int32)
    fs[("item", "y")] = item_label

    mesh = create_store_mesh()
    loader = DistNeighborLoader(
        (fs, gs), [4, 4], mesh=mesh,
        input_nodes=("item", np.arange(n_item)), batch_size=32, seed=0)

    # -- tiny typed model: per-type input projection + 2 dense layers on
    # the deepest level's features, classified at the seeds ------------
    import flax.linen as nn

    graph = gs.finalize()
    ranges = {nt: (int(graph.node_offsets[nt]), int(gs.num_nodes(nt)))
              for nt in gs.node_types}

    class TypedSAGE(nn.Module):
        hidden: int = 32
        classes: int = 4

        @nn.compact
        def __call__(self, x_by_type, sample):
            inp = sample.levels[-1]
            h = jnp.zeros((inp.shape[0], self.hidden), jnp.float32)
            for nt, xv in x_by_type.items():
                proj = nn.Dense(self.hidden, name=f"in_{nt}")(xv)
                off, n = ranges[nt]
                is_t = (inp >= off) & (inp < off + n)
                h = jnp.where(is_t[:, None], proj, h)
            h = nn.relu(h)
            # mean over each level-0 seed's sampled neighbors per etype
            # (dst_activations / gather_neighbors handle the sharded
            # concatenated layout of distributed batches)
            agg = sample.dst_activations(h, 0)
            for ename, hop in sample.hops[0].items():
                k = hop.neigh_local.shape[1]
                neigh = sample.gather_neighbors(h, 0, ename)
                m = hop.mask[..., None]
                agg = agg + jnp.sum(jnp.where(m, neigh, 0), axis=1) / k
            return nn.Dense(self.classes, name="out")(nn.relu(agg))

    model = TypedSAGE()
    batch0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), batch0.x, batch0.sample)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, sample, y, seeds):
        def loss_fn(p):
            logits = model.apply(p, x, sample)
            ok = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(y, 0))
            return jnp.sum(jnp.where(ok, ls, 0)) / jnp.maximum(
                jnp.sum(ok), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for epoch in range(8):
        for batch in loader:
            params, opt, loss = step(params, opt, batch.x, batch.sample,
                                     batch.y, batch.seeds)
            losses.append(float(loss))
    print(f"first loss {losses[0]:.3f} -> last {losses[-1]:.3f}")
    assert losses[-1] < losses[0]
    print("OK")


if __name__ == "__main__":
    main()
