"""--preset resolution across the four training drivers.

The reference scales model size purely through flags
(/root/reference/audio8/pretrain.py:39-42); the presets are a
convenience layer over those same knobs, so explicit flags must win.
"""
from audio8_tpu.cli import pretrain, pretrain_paired, train, train_seq2seq

BASE_ARGS = ["--manifest_dir", "/tmp/m"]
TRAIN_ARGS = ["--root_dir", "/tmp/m", "--vocab_file", "/tmp/v"]


def test_pretrain_large_preset():
    args = pretrain.parse_args(BASE_ARGS + ["--preset", "large"])
    assert (args.d_model, args.d_ff, args.num_heads, args.num_layers,
            args.final_dim) == (1024, 4096, 16, 24, 768)


def test_pretrain_base_default():
    args = pretrain.parse_args(BASE_ARGS)
    assert (args.d_model, args.d_ff, args.num_heads, args.num_layers,
            args.final_dim) == (768, 3072, 12, 12, 256)


def test_explicit_flag_beats_preset():
    args = pretrain.parse_args(
        BASE_ARGS + ["--preset", "large", "--num_layers", "6"])
    assert args.num_layers == 6
    assert args.d_model == 1024


def test_large_lv60_preset():
    args = pretrain.parse_args(BASE_ARGS + ["--preset", "large-lv60"])
    assert (args.d_model, args.num_layers, args.final_dim) == (1024, 24, 768)
    assert args.pre_norm is True
    assert args.extractor_mode == "layer"
    assert args.conv_bias is True


def test_other_drivers_accept_preset():
    for mod, extra in ((train, TRAIN_ARGS),
                       (train_seq2seq, TRAIN_ARGS),
                       (pretrain_paired, TRAIN_ARGS)):
        args = mod.parse_args(extra + ["--preset", "large"])
        assert (args.d_model, args.num_layers) == (1024, 24), mod.__name__


def test_explicit_flag_equal_to_base_default_beats_preset():
    """--preset large --num_heads 12: the explicit 12 must survive even
    though it equals the base default (None-sentinel resolution)."""
    args = pretrain.parse_args(
        BASE_ARGS + ["--preset", "large", "--num_heads", "12"])
    assert args.num_heads == 12
    assert args.d_model == 1024


def test_lv60_preset_explicit_topology_override():
    args = pretrain.parse_args(
        BASE_ARGS + ["--preset", "large-lv60", "--pre_norm", "false"])
    assert args.pre_norm is False
    assert args.extractor_mode == "layer"
