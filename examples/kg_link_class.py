"""Knowledge-graph link classification (ogbl-wikikg2 shape).

ref python/cugraph-pyg/cugraph_pyg/examples/rgcn_link_class_mnmg.py:
one entity type, R relations stored as a per-EDGE attribute on a
homogeneous graph, LEARNED node embeddings (wikikg2 has no features),
RGCN encoder consuming the relation of each sampled edge (FastRGCNConv
pattern), GAE-style dot-product reconstruction loss over positive seed
edges and binary negatives.

TPU shape notes: the relation attribute converts once to CSR edge-id
order (SamplingGraph.edge_attr_to_csr_order) so the sampled batch's
fixed-fanout edge_ids index it directly, and the per-edge relation
drive RGCNConv.edgewise — per-relation masked fanout aggregation (all
static shapes).

Usage:
    python examples/kg_link_class.py --epochs 5
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
    p.add_argument("--num-entities", type=int, default=2000)
    p.add_argument("--num-relations", type=int, default=6)
    p.add_argument("--num-edges", type=int, default=12000)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader.link_loader import LinkNeighborLoader
    from cugraph_gnn_tpu.models.conv import RGCNConv

    rng = np.random.default_rng(0)
    n, n_rel, n_e = args.num_entities, args.num_relations, args.num_edges

    # Synthetic wikikg2-like KG: relation r mostly links entity cluster
    # r -> cluster (r+1) % R, so relations carry signal.
    rel = rng.integers(0, n_rel, n_e).astype(np.int32)
    csize = n // n_rel
    src = (rel * csize + rng.integers(0, csize, n_e)).astype(np.int32)
    dst = (((rel + 1) % n_rel) * csize
           + rng.integers(0, csize, n_e)).astype(np.int32)
    noise = rng.random(n_e) < 0.1
    dst[noise] = rng.integers(0, n, noise.sum())

    et = ("n", "e", "n")
    gs = GraphStore()
    gs.put_edge_index((src, dst), et, num_nodes=(n, n))
    fs = FeatureStore()
    # wikikg2 has no node features; the encoder learns embeddings.
    # Provide ids so the loader can join (unused by the model).
    fs[("", "x")] = np.zeros((n, 1), np.float32)

    fanouts = parse_fanouts(args.neighbors)
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=fanouts,
        edge_label_index=np.stack([src, dst]),
        neg_sampling="binary", batch_size=args.batch_size, shuffle=True)

    graph = gs.finalize()
    # relation attribute -> CSR edge-id order, once (the reference
    # looks relations up by the sampled batch's e_id)
    rel_csr = graph.edge_attr_to_csr_order(et, rel)

    hidden = args.hidden_dim

    class KGEncoder(nn.Module):
        """Learned entity embeddings + per-edge-relation RGCN stack."""

        def setup(self):
            self.node_emb = self.param(
                "node_emb", nn.initializers.xavier_uniform(), (n, hidden))
            self.convs = [
                RGCNConv(hidden, num_relations=n_rel, name=f"conv_{i}")
                for i in range(len(fanouts))
            ]

        def __call__(self, batch, rel_by_hop):
            inp = batch.input_nodes
            h = jnp.where((inp >= 0)[:, None],
                          self.node_emb[jnp.clip(inp, 0)], 0)
            num_hops = batch.num_hops
            for li in range(num_hops - 1, -1, -1):
                conv = self.convs[num_hops - 1 - li]
                h = conv.edgewise(
                    batch.dst_activations(h, li),
                    batch.gather_neighbors(h, li),
                    batch.hops[li].mask, rel_by_hop[li])
                if li != 0:
                    h = nn.relu(h)
            return h

    model = KGEncoder()
    b0 = next(iter(loader))

    def rels_of(sample):
        return [rel_csr[jnp.clip(hop.edge_ids, 0)] for hop in sample.hops]

    params = model.init(jax.random.PRNGKey(0), b0.sample,
                        rels_of(b0.sample))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, sample, rel_by_hop, eli, label, seeds):
        def loss_fn(p):
            z = model.apply(p, sample, rel_by_hop)
            score = jnp.sum(z[eli[0]] * z[eli[1]], axis=-1)
            valid = (seeds[eli[0]] >= 0) & (seeds[eli[1]] >= 0)
            ls = optax.sigmoid_binary_cross_entropy(score, label)
            loss = jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
            acc = jnp.sum(jnp.where(
                valid, ((score > 0) == (label > 0.5)).astype(jnp.float32),
                0)) / jnp.maximum(jnp.sum(valid), 1)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss, acc

    for epoch in range(args.epochs):
        tot = acc_tot = nb = 0.0
        for b in loader:
            params, opt, loss, acc = step(
                params, opt, b.sample, rels_of(b.sample),
                b.edge_label_index, b.edge_label, b.seeds)
            tot += float(loss)
            acc_tot += float(acc)
            nb += 1
        print(f"epoch {epoch}: loss {tot / max(nb, 1):.4f} "
              f"acc {acc_tot / max(nb, 1):.3f}")


if __name__ == "__main__":
    main()
