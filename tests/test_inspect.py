"""a8t-inspect: checkpoint summaries across the three loadable formats."""
import jax
import jax.numpy as jnp
import numpy as np

from audio8_tpu.cli.inspect_checkpoint import main
from audio8_tpu.config import AcousticConfig
from audio8_tpu.models.wav2vec2 import Wav2Vec2AcousticModel
from audio8_tpu.train.checkpoint import save_checkpoint


def test_inspect_a8t_checkpoint(tmp_path, capsys):
    cfg = AcousticConfig(num_labels=8, d_model=32, num_heads=2,
                         num_layers=1, d_ff=64)
    model = Wav2Vec2AcousticModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8000)))["params"]
    save_checkpoint({"params": params}, str(tmp_path / "ckpt"), 17)
    s = main([str(tmp_path / "ckpt-step-17")])
    out = capsys.readouterr().out
    assert s["format"].startswith("a8t") and s["step"] == 17
    n_manual = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    assert s["total_params"] == n_manual
    assert "total params" in out and "by module" in out


def test_inspect_torch_pt(tmp_path):
    import torch

    sd = {"encoder.weight": torch.zeros(4, 8), "proj.bias": torch.ones(3)}
    torch.save({"model": sd, "optimizer": {}}, tmp_path / "m.pt")
    s = main([str(tmp_path / "m.pt"), "--json"])
    assert s["format"] == "fairseq/torch .pt"
    assert s["total_params"] == 35 and s["optimizer_state"]


def test_inspect_tree_listing(tmp_path, capsys):
    import torch

    torch.save({"model": {"w": torch.zeros(2, 2)}}, tmp_path / "m.pt")
    main([str(tmp_path / "m.pt"), "--tree"])
    out = capsys.readouterr().out
    assert "w" in out and "(2, 2)" in out
