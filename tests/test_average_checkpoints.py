"""Checkpoint averaging tool (cli/average_checkpoints.py)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from audio8_tpu.cli.average_checkpoints import (
    average_checkpoints,
    list_step_checkpoints,
    main,
)
from audio8_tpu.train.checkpoint import save_checkpoint, load_checkpoint


def _params(scale):
    return {
        "dense": {"kernel": np.full((4, 8), scale, np.float32),
                  "bias": np.zeros((8,), np.float32)},
        "steps": {"count": np.asarray(int(scale), np.int32)},
    }


def test_average_is_elementwise_mean(tmp_path):
    base = os.path.join(tmp_path, "checkpoint")
    p1 = save_checkpoint({"params": _params(1.0), "step": np.asarray(100)},
                         base, 100)
    p2 = save_checkpoint({"params": _params(3.0), "step": np.asarray(200)},
                         base, 200)
    avg, step = average_checkpoints([p1, p2])
    np.testing.assert_allclose(avg["dense"]["kernel"], 2.0)
    assert avg["dense"]["kernel"].dtype == np.float32
    # integer leaves come from the first checkpoint, not averaged
    assert avg["steps"]["count"] == 1
    assert int(step) == 200


def test_main_writes_loadable_checkpoint(tmp_path):
    base = os.path.join(tmp_path, "checkpoint")
    for s, scale in [(10, 0.0), (20, 2.0), (30, 4.0)]:
        save_checkpoint({"params": _params(scale), "step": np.asarray(s)},
                        base, s)
    paths, steps = list_step_checkpoints(str(tmp_path))
    assert steps == [10, 20, 30]
    out = main(["--basedir", str(tmp_path), "--last", "2",
                "--output", os.path.join(tmp_path, "avgd")])
    loaded = load_checkpoint(out)
    np.testing.assert_allclose(loaded["params"]["dense"]["kernel"], 3.0)

    # and the eval CLIs can restore it (resolve_restart params-only path)
    from audio8_tpu.cli.common import resolve_restart

    init = _params(9.0)
    params, _, _ = resolve_restart(out, init)
    np.testing.assert_allclose(params["dense"]["kernel"], 3.0)


def test_requires_two_checkpoints(tmp_path):
    base = os.path.join(tmp_path, "checkpoint")
    save_checkpoint({"params": _params(1.0), "step": np.asarray(1)}, base, 1)
    with pytest.raises(SystemExit):
        main(["--basedir", str(tmp_path), "--output",
              os.path.join(tmp_path, "avgd")])
