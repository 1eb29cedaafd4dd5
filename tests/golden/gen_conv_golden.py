"""Golden-activation generator: PyG-semantics convs in pure PyTorch.

BASELINE.md demands "per-layer activations allclose vs reference
semantics".  The reference consumes PyG convs
(ref pylibwholegraph/torch/gnn_model.py:34-77); PyG itself is not in
this image (zero egress), so the goldens come from an INDEPENDENT
implementation of PyG's documented equations in plain torch — dense
adjacency math, different library, different author path than the JAX
convs under test:

- SAGEConv:  h = W_self x + b + W_neigh mean_{j in N(i)} x_j
- GCNConv:   h = (D^-1/2 (A+I) D^-1/2) X W + b, deg from target index
             (torch_geometric.nn.conv.gcn_conv.gcn_norm semantics)
- GATConv:   e_ij = LeakyReLU(a_dst . Wx_i + a_src . Wx_j), softmax over
             j in N(i) (self-loops pre-added like PyG's default),
             h_i = concat_h sum_j alpha_ij Wx_j + b
- GINConv:   h = MLP((1+eps) x + sum_j x_j)
- RGCNConv:  h = W_root x + b + sum_r W_r mean_{j in N_r(i)} x_j

Run from the repo root:  python tests/golden/gen_conv_golden.py
Writes tests/golden/conv_golden.npz (committed; the test only reads it).
"""

import os

import numpy as np
import torch

torch.manual_seed(0)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "conv_golden.npz")

N, F_IN, F_OUT = 30, 12, 8
HEADS, F_HEAD = 3, 5
N_REL = 3
E = 120

rng = np.random.default_rng(42)
src = rng.integers(0, N, E).astype(np.int64)
dst = rng.integers(0, N, E).astype(np.int64)
etype = rng.integers(0, N_REL, E).astype(np.int64)
x = rng.standard_normal((N, F_IN)).astype(np.float32)

xt = torch.tensor(x, dtype=torch.float64)
A = torch.zeros(N, N, dtype=torch.float64)  # A[i, j] = edge j -> i
for s, d in zip(src, dst):
    A[d, s] += 1.0
deg_in = A.sum(dim=1)  # in-degree (multi-edges count)

out = {"src": src, "dst": dst, "etype": etype, "x": x}


def t2n(t):
    return t.detach().numpy().astype(np.float32)


def lin(f_in, f_out):
    w = torch.randn(f_in, f_out, dtype=torch.float64) * 0.3
    return w


# --- SAGEConv (mean) --------------------------------------------------------
w_self = lin(F_IN, F_OUT)
w_neigh = lin(F_IN, F_OUT)
b = torch.randn(F_OUT, dtype=torch.float64) * 0.1
mean_agg = A @ xt / deg_in.clamp(min=1).unsqueeze(1)
sage = xt @ w_self + b + mean_agg @ w_neigh
out.update(sage_w_self=t2n(w_self), sage_w_neigh=t2n(w_neigh),
           sage_b=t2n(b), sage_out=t2n(sage))

# --- GCNConv ---------------------------------------------------------------
w_gcn = lin(F_IN, F_OUT)
b_gcn = torch.randn(F_OUT, dtype=torch.float64) * 0.1
A_hat = A + torch.eye(N, dtype=torch.float64)
deg_hat = A_hat.sum(dim=1)  # PyG gcn_norm: deg from the target index
dinv = deg_hat.clamp(min=1).pow(-0.5)
norm_A = dinv.unsqueeze(1) * A_hat * dinv.unsqueeze(0)
gcn = norm_A @ xt @ w_gcn + b_gcn
out.update(gcn_w=t2n(w_gcn), gcn_b=t2n(b_gcn), gcn_out=t2n(gcn))

# --- GATConv (3 heads, concat, self-loops pre-added) ------------------------
w_gat = lin(F_IN, HEADS * F_HEAD)
att_src = torch.randn(HEADS, F_HEAD, dtype=torch.float64) * 0.3
att_dst = torch.randn(HEADS, F_HEAD, dtype=torch.float64) * 0.3
b_gat = torch.randn(HEADS * F_HEAD, dtype=torch.float64) * 0.1
# self-loops added to the edge set (PyG GATConv default); the JAX side
# is fed the same augmented edge list
src_sl = np.concatenate([src, np.arange(N)])
dst_sl = np.concatenate([dst, np.arange(N)])
wx = (xt @ w_gat).reshape(N, HEADS, F_HEAD)
a_s = (wx * att_src.unsqueeze(0)).sum(-1)  # (N, H)
a_d = (wx * att_dst.unsqueeze(0)).sum(-1)
gat = torch.zeros(N, HEADS, F_HEAD, dtype=torch.float64)
for h in range(HEADS):
    e = torch.full((N, N), -torch.inf, dtype=torch.float64)
    cnt = torch.zeros(N, N, dtype=torch.float64)
    for s, d in zip(src_sl, dst_sl):
        z = a_d[d, h] + a_s[s, h]
        z = z if z >= 0 else 0.2 * z  # leaky_relu, slope 0.2
        # multi-edges: PyG softmaxes per EDGE; with a dense matrix we
        # fold multiplicity into the exp weight
        if torch.isinf(e[d, s]):
            e[d, s] = z
        cnt[d, s] += 1.0
    ex = torch.where(torch.isinf(e), torch.zeros_like(e),
                     e.clamp(min=-60).exp()) * cnt
    denom = ex.sum(dim=1, keepdim=True).clamp(min=1e-30)
    alpha = ex / denom
    gat[:, h] = alpha @ wx[:, h, :]
gat = gat.reshape(N, HEADS * F_HEAD) + b_gat
out.update(gat_w=t2n(w_gat), gat_att_src=t2n(att_src),
           gat_att_dst=t2n(att_dst), gat_b=t2n(b_gat), gat_out=t2n(gat),
           gat_src_sl=src_sl, gat_dst_sl=dst_sl)

# --- GINConv ----------------------------------------------------------------
w1 = lin(F_IN, F_OUT)
b1 = torch.randn(F_OUT, dtype=torch.float64) * 0.1
w2 = lin(F_OUT, F_OUT)
b2 = torch.randn(F_OUT, dtype=torch.float64) * 0.1
eps = 0.0
z = (1 + eps) * xt + A @ xt
gin = torch.relu(z @ w1 + b1) @ w2 + b2
out.update(gin_w1=t2n(w1), gin_b1=t2n(b1), gin_w2=t2n(w2), gin_b2=t2n(b2),
           gin_out=t2n(gin))

# --- RGCNConv (mean per relation) --------------------------------------------
w_root = lin(F_IN, F_OUT)
b_r = torch.randn(F_OUT, dtype=torch.float64) * 0.1
w_rel = [lin(F_IN, F_OUT) for _ in range(N_REL)]
rgcn = xt @ w_root + b_r
for r in range(N_REL):
    Ar = torch.zeros(N, N, dtype=torch.float64)
    for s, d, t in zip(src, dst, etype):
        if t == r:
            Ar[d, s] += 1.0
    dr = Ar.sum(dim=1).clamp(min=1)
    rgcn = rgcn + (Ar @ xt / dr.unsqueeze(1)) @ w_rel[r]
out.update(rgcn_w_root=t2n(w_root), rgcn_b=t2n(b_r),
           rgcn_out=t2n(rgcn),
           **{f"rgcn_w_rel_{r}": t2n(w_rel[r]) for r in range(N_REL)})

np.savez_compressed(OUT, **out)
print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")
