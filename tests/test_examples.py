"""Smoke tests: every example must run end-to-end with tiny settings
(the reference gates examples in CI similarly, ref
ci/run_cugraph_pyg_pytests.sh)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           JAX_NUM_CPU_DEVICES="8", PYTHONPATH=REPO)

SNIPPET = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "jax.config.update('jax_num_cpu_devices',8); "
    "import sys; sys.argv=[sys.argv[0]]+ARGS; "
    "exec(open(SCRIPT).read())"
)


def run_example(script, args, timeout=240):
    code = SNIPPET.replace("ARGS", repr(args)).replace(
        "SCRIPT", repr(os.path.join(REPO, "examples", script)))
    r = subprocess.run([sys.executable, "-c", code], env=ENV, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    return r


def test_node_classification_example():
    # quality gate (VERDICT r2 #9): karate must actually train, not
    # just exit 0 — a majority-class regression scores ~0.5
    r = run_example("node_classification.py",
                    ["--dataset", "karate", "--epochs", "25",
                     "--batch-size", "34", "--neighbors", "10,10"])
    import re
    m = re.search(r"train accuracy: ([0-9.]+)", r.stdout)
    assert m, r.stdout[-1500:]
    assert float(m.group(1)) >= 0.9, r.stdout[-1500:]


def test_link_prediction_example():
    # quality gate: AUC of positives vs sampled negatives must clear
    # chance by a wide margin
    r = run_example("link_prediction.py",
                    ["--epochs", "12", "--batch-size", "32",
                     "--neighbors", "5,5"], timeout=360)
    import re
    m = re.search(r"link-pred AUC: ([0-9.]+)", r.stdout)
    assert m, r.stdout[-1500:]
    assert float(m.group(1)) >= 0.75, r.stdout[-1500:]


def test_rgcn_hetero_example():
    run_example("rgcn_hetero.py",
                ["--epochs", "1", "--batch-size", "32",
                 "--num-papers", "200", "--num-authors", "100",
                 "--num-insts", "20"])


def test_dist_full_batch_example():
    run_example("dist_full_batch_training.py",
                ["--devices", "8", "--epochs", "40", "--num-nodes", "1024",
                 "--band", "100"], timeout=400)


def test_movielens_example():
    run_example("movielens_rec.py",
                ["--epochs", "1", "--batch-size", "64",
                 "--neighbors", "3,3", "--num-users", "150",
                 "--num-movies", "200", "--num-ratings", "1500"])


def test_kg_link_class_example():
    run_example("kg_link_class.py",
                ["--epochs", "1", "--batch-size", "64",
                 "--neighbors", "3,3", "--num-entities", "300",
                 "--num-edges", "1500"])


def test_multichip_example():
    run_example("multichip_training.py",
                ["--devices", "8", "--epochs", "1", "--num-nodes", "512",
                 "--num-edges", "4096", "--batch-size", "64"],
                timeout=400)


def test_ogbn_convert_example(tmp_path):
    run_example("ogbn_convert.py",
                ["--out", str(tmp_path), "--synthetic", "200", "800", "16",
                 "--parts", "4"])
    assert (tmp_path / "meta.json").exists()


def test_hetero_link_pred_example():
    run_example("hetero_link_pred.py",
                ["--epochs", "1", "--batch-size", "16",
                 "--num-papers", "200", "--num-authors", "100",
                 "--num-writes", "600", "--neighbors", "3,3"])


def test_hetero_link_pred_disjoint_example():
    # disjoint=True through the hetero LinkNeighborLoader
    # (VERDICT r2 #7: per-seed typed subgraphs via the loader surface)
    run_example("hetero_link_pred.py",
                ["--epochs", "1", "--batch-size", "16",
                 "--num-papers", "200", "--num-authors", "100",
                 "--num-writes", "600", "--neighbors", "3,3",
                 "--disjoint"], timeout=360)


def test_cached_embedding_example():
    run_example("cached_embedding_training.py",
                ["--epochs", "1", "--batch-size", "32",
                 "--num-nodes", "1000", "--num-edges", "5000",
                 "--neighbors", "3,3"])


def test_ogbn_train_example(tmp_path):
    run_example("ogbn_convert.py",
                ["--out", str(tmp_path), "--synthetic", "300", "2400", "16",
                 "--parts", "4"])
    run_example("ogbn_train.py",
                ["--dir", str(tmp_path), "--epochs", "2",
                 "--batch-size", "32", "--neighbors", "4,4"])


def test_full_batch_training_example():
    run_example("full_batch_training.py", [])


def test_full_batch_training_rgcn_example():
    # round 5: full-batch R-GCN rides RelationalFullBatch (per-relation
    # slabs on the shared union-RCM order)
    r = run_example("full_batch_training.py",
                    ["--model", "rgcn", "--epochs", "40"])
    import re
    m = re.search(r"accuracy: ([0-9.]+)", r.stdout)
    assert m and float(m.group(1)) > 0.9, r.stdout[-1500:]


def test_full_batch_training_gat_example():
    # fused slab attention fwd + one-pass bwd through the canonical
    # example surface (accuracy-gated inside the script)
    run_example("full_batch_training.py", ["--model", "gat",
                                           "--epochs", "40"])


def test_hetero_dist_training_example():
    run_example("hetero_dist_training.py", [], timeout=480)


def test_xgb_downstream_example():
    pytest.importorskip("sklearn")
    r = run_example("xgb_downstream.py",
                    ["--num_nodes", "600", "--epochs", "1",
                     "--hidden_dim", "16", "--num_boost_round", "3"])
    assert "mlogloss" in r.stdout


def test_fraud_detection_example():
    pytest.importorskip("sklearn")
    # quality gate: the GNN embeddings must LIFT the forest's AUC on
    # the planted-neighborhood fraud signal (not merely run)
    r = run_example("fraud_detection.py",
                    ["--num-nodes", "800", "--epochs", "4",
                     "--batch-size", "64", "--neighbors", "8,8",
                     "--hidden-dim", "32"], timeout=360)
    assert "RF with GNN" in r.stdout and "gnn-embedding lift" in r.stdout
    import re
    m = re.search(r"gnn-embedding lift: acc ([+-][0-9.]+) "
                  r"auc ([+-][0-9.]+)", r.stdout)
    assert m, r.stdout[-1500:]
    assert float(m.group(2)) > 0.0, r.stdout[-1500:]
