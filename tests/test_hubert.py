"""HuBERT masked-prediction pretraining: target pipeline, loss, model,
and the end-to-end driver (cluster targets -> a few train steps)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio8_tpu.config import CONV_FEATURES, HubertPretrainConfig, conv_output_length
from audio8_tpu.data.mfcc import assign_clusters, kmeans, mfcc
from audio8_tpu.models.hubert import HubertPretrainModel, hubert_pretrain_loss


def test_mfcc_frames_align_with_conv_grid():
    rng = np.random.default_rng(0)
    for t in (400, 4000, 16000, 41_359):
        x = rng.normal(size=t).astype(np.float32)
        feats = mfcc(x)
        assert feats.shape == (conv_output_length(t, CONV_FEATURES[16]), 39)
        assert np.isfinite(feats).all()


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(500, 8)) + 10.0
    b = rng.normal(size=(500, 8)) - 10.0
    feats = np.concatenate([a, b])
    cents = kmeans(feats, 2, n_iter=10, seed=0)
    ids = assign_clusters(feats, cents)
    assert len(set(ids[:500])) == 1
    assert len(set(ids[500:])) == 1
    assert ids[0] != ids[-1]


def test_hubert_loss_matches_numpy():
    rng = np.random.default_rng(2)
    b, t, k = 2, 8, 5
    logits = rng.normal(size=(b, t, k)).astype(np.float32)
    targets = rng.integers(0, k, size=(b, t)).astype(np.int32)
    targets[1, 6:] = -1
    lengths = np.array([8, 6], np.int32)
    mask = rng.random((b, t)) < 0.5
    pad = np.ones((b, t), bool)

    loss, metrics = hubert_pretrain_loss(
        jnp.asarray(logits), jnp.asarray(mask), jnp.asarray(pad),
        jnp.asarray(targets), jnp.asarray(lengths), 1.0, 0.0)

    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)
                                  ).sum(-1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    want = 0.0
    n = 0
    correct = total = 0
    for i in range(b):
        for j in range(t):
            if targets[i, j] < 0 or j >= lengths[i]:
                continue
            if mask[i, j]:
                want += -logp[i, j, targets[i, j]]
                n += 1
                correct += int(logits[i, j].argmax() == targets[i, j])
                total += 1
    np.testing.assert_allclose(float(loss), want / n, rtol=1e-5)
    np.testing.assert_allclose(float(metrics["acc_masked"]), correct / total,
                               rtol=1e-6)


@pytest.mark.slow
def test_hubert_model_shapes_and_grads():
    cfg = HubertPretrainConfig(num_clusters=12, final_dim=16, d_model=32,
                               num_heads=2, num_layers=1, d_ff=64,
                               dropout=0.0)
    model = HubertPretrainModel(config=cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4000)),
                    jnp.float32)
    lens = jnp.asarray([4000, 3000], jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "mask": jax.random.PRNGKey(1)}, x, lens)["params"]
    logits, tm, pm = model.apply({"params": params}, x, lens,
                                 rngs={"mask": jax.random.PRNGKey(2)})
    tp = conv_output_length(4000, CONV_FEATURES[16])
    assert logits.shape == (2, tp, 12)
    assert tm.shape == (2, tp) and pm.shape == (2, tp)
    assert bool(tm.any())  # mask applied at eval too (metric needs it)

    targets = jnp.asarray(
        np.random.default_rng(4).integers(0, 12, size=(2, tp)), jnp.int32)
    lengths = jnp.asarray([tp, tp - 2], jnp.int32)

    def loss_fn(p):
        lg, m, pad = model.apply(
            {"params": p}, x, lens,
            rngs={"mask": jax.random.PRNGKey(2)})
        return hubert_pretrain_loss(lg, m, pad, targets, lengths)[0]

    grads = jax.grad(loss_fn)(params)
    assert float(np.abs(grads["label_embs"]).max()) > 0
    assert float(np.abs(
        grads["encoder"]["transformer"]["layer_0"]["self_attn"]["w_Q"][
            "kernel"]).max()) > 0


def test_hubert_grads_finite_with_padding_row():
    """Regression: a fully padded row (signal_lengths == 0, the batch-size
    snapping filler) must not NaN the gradients — the naive
    sqrt-then-max l2-normalize had inf*0 backward at exactly-zero
    vectors."""
    cfg = HubertPretrainConfig(num_clusters=6, final_dim=16, d_model=32,
                               num_heads=2, num_layers=1, d_ff=64,
                               dropout=0.1)
    model = HubertPretrainModel(config=cfg)
    x = np.zeros((2, 4000), np.float32)
    x[0] = np.random.default_rng(8).normal(size=4000)
    lens = jnp.asarray([4000, 0], jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "mask": jax.random.PRNGKey(1)},
                        jnp.asarray(x), lens)["params"]
    tp = conv_output_length(4000, CONV_FEATURES[16])
    targets = np.full((2, tp), -1, np.int32)
    targets[0] = np.random.default_rng(9).integers(0, 6, size=tp)
    lengths = jnp.asarray([tp, 0], jnp.int32)

    def loss_fn(p):
        lg, m, pad = model.apply(
            {"params": p}, jnp.asarray(x), lens, train=True,
            rngs={"mask": jax.random.PRNGKey(2),
                  "dropout": jax.random.PRNGKey(3)})
        return hubert_pretrain_loss(lg, m, pad, jnp.asarray(targets),
                                    lengths)[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(leaf)).all(), \
            "/".join(str(getattr(k, "key", k)) for k in path)


def test_hubert_tree_warmstarts_ctc_encoder():
    """The HuBERT param tree mirrors Wav2Vec2Encoder, so a pretrained
    tree fills every encoder leaf of the downstream CTC model (the
    pretrain->fine-tune handoff)."""
    from audio8_tpu.config import AcousticConfig
    from audio8_tpu.models.convert import merge_params
    from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel

    hcfg = HubertPretrainConfig(num_clusters=12, final_dim=16, d_model=32,
                                num_heads=2, num_layers=1, d_ff=64)
    hub = HubertPretrainModel(config=hcfg)
    x = jnp.zeros((1, 4000), jnp.float32)
    hparams = hub.init({"params": jax.random.PRNGKey(0),
                        "mask": jax.random.PRNGKey(1)}, x)["params"]

    acfg = AcousticConfig(num_labels=8, d_model=32, num_heads=2,
                          num_layers=1, d_ff=64)
    am = Wav2Vec2AcousticModel(config=acfg)
    ainit = am.init(jax.random.PRNGKey(2), x)["params"]
    dropped: list = []
    merged = merge_params(ainit["encoder"], hparams, dropped)
    # every encoder leaf of the CTC model is covered by the hubert tree
    flat = lambda t: {"/".join(str(getattr(k, "key", k)) for k in p)
                      for p, _ in jax.tree_util.tree_leaves_with_path(t)}
    assert flat(merged) == flat(ainit["encoder"])
    got = np.asarray(merged["proj_to_input"]["kernel"])
    np.testing.assert_allclose(got, hparams["proj_to_input"]["kernel"])
    # only the pretraining head is dropped
    assert {d.split("/")[0] for d in dropped} <= {"final_proj", "label_embs"}


@pytest.fixture
def km_corpus(tmp_path):
    """Tiny corpus + k-means targets via the real CLI tool."""
    from scipy.io import wavfile

    from audio8_tpu.cli.cluster_targets import main as cluster_main

    audio = tmp_path / "audio"
    audio.mkdir()
    rng = np.random.default_rng(5)
    for split, n_utts in (("train", 6), ("valid", 2)):
        with open(tmp_path / f"{split}.tsv", "w") as tf:
            tf.write(str(audio) + "\n")
            for i in range(n_utts):
                n = 8000 + 2000 * i
                wavfile.write(str(audio / f"{split}{i}.wav"), 16000,
                              (rng.normal(size=n) * 5000).astype(np.int16))
                tf.write(f"{split}{i}.wav\t{n}\n")
    rc = cluster_main(["--root_dir", str(tmp_path),
                       "--manifests", "train.tsv", "valid.tsv",
                       "--num_clusters", "4", "--fit_frames", "2000",
                       "--kmeans_iters", "5"])
    assert rc == 0
    return tmp_path


@pytest.mark.slow
def test_cluster_targets_and_pretrain_cli(km_corpus, tmp_path):
    """End-to-end: a8t-cluster-targets -> a8t-pretrain-hubert for a few
    steps; km labels align with the conv grid of each utterance."""
    from audio8_tpu.config import CONV_FEATURES, conv_output_length
    from audio8_tpu.cli.pretrain_hubert import train

    with open(km_corpus / "train.tsv") as tf, \
            open(km_corpus / "train.km") as kf:
        tf.readline()
        for audio_line, km_line in zip(tf, kf):
            n = int(audio_line.split("\t")[1])
            ids = km_line.split()
            assert len(ids) == conv_output_length(n, CONV_FEATURES[16])
            assert all(0 <= int(i) < 4 for i in ids)

    state = train(["--root_dir", str(km_corpus),
                   "--train_dataset", "train.tsv",
                   "--valid_dataset", "valid.tsv",
                   "--basedir", str(tmp_path / "out"),
                   "--num_clusters", "4", "--final_dim", "16",
                   "--d_model", "32", "--num_heads", "2", "--num_layers", "1",
                   "--d_ff", "64", "--train_steps", "3",
                   "--steps_per_checkpoint", "3", "--warmup_steps", "1",
                   "--valid_steps", "2",
                   "--target_tokens_per_batch", "32000",
                   "--pad_to_multiple", "4000"])
    assert int(state.step) == 3
    assert os.path.exists(str(tmp_path / "out"))

    # iteration 2: re-cluster the trained model's layer-1 features from
    # the checkpoint just written; labels must stay conv-grid-aligned
    from audio8_tpu.cli.cluster_targets import main as cluster_main

    rc = cluster_main(["--root_dir", str(km_corpus),
                       "--manifests", "valid.tsv",
                       "--num_clusters", "3", "--fit_frames", "500",
                       "--kmeans_iters", "3",
                       "--checkpoint", str(tmp_path / "out"),
                       "--feature_layer", "1",
                       "--d_model", "32", "--num_heads", "2",
                       "--num_layers", "1", "--d_ff", "64"])
    assert rc == 0
    with open(km_corpus / "valid.tsv") as tf, \
            open(km_corpus / "valid.km") as kf:
        tf.readline()
        for audio_line, km_line in zip(tf, kf):
            n = int(audio_line.split("\t")[1])
            ids = km_line.split()
            assert len(ids) == conv_output_length(n, CONV_FEATURES[16])
            assert all(0 <= int(i) < 3 for i in ids)
