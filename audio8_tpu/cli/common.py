"""Shared CLI plumbing: logging, restart/warm-start resolution, device setup."""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from audio8_tpu.models.convert import load_fairseq_bin, merge_params
from audio8_tpu.utils import str2bool
from audio8_tpu.train.checkpoint import (
    find_latest_checkpoint,
    load_checkpoint,
    parse_checkpoint_step,
)

logger = logging.getLogger("audio8_tpu")


def setup(distributed: bool = False) -> Tuple[int, int]:
    """Initialize multi-host JAX if requested; returns (process_index,
    process_count). Replaces init_distributed/NCCL
    (/root/reference/audio8/train.py:141; SURVEY.md §2.7)."""
    if distributed and os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # explicit bootstrap for generic launchers; bare initialize() only
        # auto-detects TPU pods / Slurm / Open MPI
        if os.environ.get("JAX_NUM_PROCESSES"):
            jax.distributed.initialize(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        else:
            jax.distributed.initialize()
    elif distributed and jax.process_count() == 1 and jax.device_count() == 1:
        logger.warning("--distributed requested but only one device/process "
                       "is visible; training proceeds single-device")
    # persistent XLA compilation cache: restarts skip the slow first
    # compile. Opt-in via env var — some PJRT plugins (e.g. the axon
    # relay) hang on executable serialization.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:  # pragma: no cover - cache is best-effort
            pass
    rank = jax.process_index()
    world = jax.process_count()
    logging.basicConfig(
        level=logging.INFO if rank == 0 else logging.WARN,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        force=True)  # jax/absl may have configured the root logger already
    logger.info("Devices: %d (%s), process %d/%d",
                jax.device_count(), jax.default_backend(), rank, world)
    return rank, world


_TOPOLOGY_DEFAULTS = dict(pre_norm=False, extractor_mode="group",
                          conv_bias=False, pos_conv_depth=1,
                          gated_rel_pos=False, encoder_type="transformer",
                          position_embeddings_type="relative")


def canonical_topology(d: Dict) -> Dict:
    """Param-placement topology keys, filled with defaults — lets
    topology dicts from different converter vintages compare equal."""
    return {k: d.get(k, v) for k, v in _TOPOLOGY_DEFAULTS.items()}


def resolve_restart(
    restart_from: Optional[str],
    init_params: Dict,
    state_template: Any = None,
    ctc: bool = False,
    num_layers: int = 12,
    sr: int = 16,
    restart_tt: Optional[str] = None,
    pre_norm: bool = False,
    extractor_mode: str = "group",
    conv_bias: bool = False,
    pos_conv_depth: int = 1,
    gated_rel_pos: bool = False,
    encoder_type: str = "transformer",
    position_embeddings_type: str = "relative",
    # no param-placement effect (kernel size / bucket-table shape come
    # from the checkpoint itself); accepted so callers can splat
    # topology_kwargs()
    conv_pos_kernel: int = 128,
    rel_pos_buckets: int = 320,
    rel_pos_max_distance: int = 800,
    conv_depthwise_kernel_size: int = 31,
    rotary_base: float = 10000.0,
    conformer_activation: str = "swish",
    causal_chunk_frames: int = 0,
    causal_left_chunks: int = -1,
) -> Tuple[Dict, Optional[Any], int]:
    """Resolve --restart_from like the reference (train.py:215-252):

    - fairseq ``.pt``: convert (pretrained first, then CTC fallback), merge
      onto the initialized tree, start at step 0;
    - a directory: pick the latest ``checkpoint-step-N``;
    - an a8t checkpoint: restore full TrainState when the template matches,
      else params-only; step parsed from the name unless restart_tt='ignore'.

    Returns (params, restored_state_or_None, global_step).
    """
    if not restart_from:
        return init_params, None, 0
    topo = dict(pre_norm=pre_norm, extractor_mode=extractor_mode,
                conv_bias=conv_bias, pos_conv_depth=pos_conv_depth,
                gated_rel_pos=gated_rel_pos, encoder_type=encoder_type,
                position_embeddings_type=position_embeddings_type)
    if restart_from.endswith(".pt"):
        try:
            loaded, report = load_fairseq_bin(restart_from, ctc=False, num_layers=num_layers, sr=sr, **topo)
            if report["missing"]:
                raise ValueError(f"missing keys: {report['missing'][:3]}...")
            if ctc:
                # a pretrained Wav2Vec2Model tree warm-starts the downstream
                # model's ``encoder`` submodule (quantizer/projection keys are
                # dropped by merge_params), mirroring the reference's
                # load_fairseq_bin(model.encoder, ...) at train.py:221
                loaded = {"encoder": loaded}
        except Exception:
            loaded, report = load_fairseq_bin(restart_from, ctc=True, num_layers=num_layers, sr=sr, **topo)
        logger.info("fairseq load report: missing=%s unexpected=%s",
                    report["missing"][:5], report["unexpected"][:5])
        return merge_params(init_params, loaded), None, 0

    from audio8_tpu.models.convert_hf import is_hf_dir, load_hf_dir

    if is_hf_dir(restart_from):
        # HF transformers save_pretrained dir (extension beyond the
        # reference): warm-start from it like a fairseq .pt
        loaded, report = load_hf_dir(restart_from, ctc="auto")
        if canonical_topology(report["topology"]) != canonical_topology(topo):
            # topology governs param PLACEMENT (encoder.ln vs the
            # stack's ln_out, per-block extractor LNs); a mismatch would
            # merge everything except those params and train with random
            # norms — fail instead of degrading silently
            raise ValueError(
                f"HF checkpoint topology {report['topology']} does not "
                f"match the model flags {topo}; pass --pre_norm/"
                f"--extractor_mode/--conv_bias (or --preset) to match")
        # quantizer/projection heads are legitimately absent from a bare
        # Wav2Vec2Model export; missing ones keep their init (the
        # reference's strict=False load, wav2vec2.py:184)
        hard_missing = [k for k in report["missing"]
                        if k.split(".")[0] not in
                        ("quantizer", "project_q", "final_proj")]
        if hard_missing:
            raise ValueError(f"HF checkpoint missing keys: {hard_missing[:5]}")
        if ctc and report["kind"] == "pretrained":
            # pretrained tree warm-starts the downstream encoder submodule
            loaded = {"encoder": loaded}
        elif not ctc and report["kind"] == "ctc":
            # ForCTC export warm-starting a pretraining model: the
            # acoustic tree's 'encoder' submodule (a Wav2Vec2Encoder) has
            # the Wav2Vec2Model top-level layout; the lm_head is dropped
            logger.info("CTC-source HF checkpoint: using its encoder to "
                        "warm-start the pretraining model (head dropped)")
            loaded = loaded["encoder"]
        logger.info("HF load report (%s): missing=%s unexpected=%s",
                    report["kind"], report["missing"][:5],
                    report["unexpected"][:5])
        return merge_params(init_params, loaded), None, 0

    path = restart_from
    if os.path.isdir(path) and not os.path.exists(os.path.join(path, "_METADATA")):
        try:
            path, _ = find_latest_checkpoint(path)
        except FileNotFoundError:
            pass
    step = 0 if restart_tt == "ignore" else parse_checkpoint_step(path)
    if state_template is not None:
        try:
            state = load_checkpoint(path, state_template)
            return state.params, state, int(state.step)
        except Exception as e:
            logger.info("Full-state restore failed (%s); trying params-only", e)
    loaded = load_checkpoint(path)
    params = loaded.get("params", loaded) if isinstance(loaded, dict) else loaded.params
    params = jax.tree_util.tree_map(np.asarray, params)
    if (ctc and "encoder" in init_params and "feature_extractor" in params
            and "feature_extractor" not in init_params):
        # a8t PRETRAIN checkpoint (Wav2Vec2Model layout) warm-starting a
        # downstream model: nest under encoder/* like the reference's
        # "load a8 checkpoint from pretrained wav2vec2 w/o CTC" fallback
        # (train.py:232-234); quantizer/projection keys drop in merge.
        params = {"encoder": params}
    dropped: list = []
    merged = merge_params(init_params, params, dropped)
    if dropped:
        logger.info("checkpoint keys not in model (dropped): %s", dropped[:8])
    return merged, None, step


def setup_parallelism(tensor_parallel: int = 1, pipeline_parallel: int = 1,
                      pp_microbatches: int = 1):
    """Build the device mesh + sharding rules for a training driver.

    Returns (mesh, rules, batch_multiple, row_shard):
    - mesh: ('data', 'model') over ALL devices — the drivers run every
      step through it, so on a multi-chip host XLA shards the batch and
      inserts the gradient psums the reference obtains from DDP
      (/root/reference/audio8/train.py:266-268,320-326). With
      pipeline_parallel > 1 the mesh is ('pipe', 'data') instead and the
      transformer stack GPipe-stages over 'pipe' (parallel/pipeline.py);
    - rules: param partition rules (TP over the transformer when
      tensor_parallel > 1, else replicated);
    - batch_multiple: required PER-PROCESS batch-size multiple, to pass to
      the datasets (under PP it includes the microbatch count, so every
      global batch splits evenly into data-sharded microbatches);
    - row_shard: True under multi-process (each process materializes its
      row block of globally-identical batches; see datasets.py).
    """
    from audio8_tpu.parallel.sharding import DP_ONLY_RULES, TP_RULES, make_mesh

    world = jax.process_count()
    if pipeline_parallel > 1:
        if tensor_parallel > 1:
            raise ValueError("--pipeline_parallel excludes --tensor_parallel")
        from audio8_tpu.parallel.pipeline import make_pp_mesh

        mesh = make_pp_mesh(pipe=pipeline_parallel)
        rules = DP_ONLY_RULES
        dp_total = mesh.shape["data"]
        if dp_total % world != 0:
            raise ValueError(
                f"data-parallel extent {dp_total} not divisible by "
                f"process count {world}")
        return mesh, rules, (dp_total // world) * max(pp_microbatches, 1), world > 1

    mesh = make_mesh(data=-1, model=max(tensor_parallel, 1))
    rules = TP_RULES if tensor_parallel > 1 else DP_ONLY_RULES
    dp_total = mesh.shape["data"]
    if dp_total % world != 0:
        raise ValueError(
            f"data-parallel extent {dp_total} not divisible by "
            f"process count {world}")
    batch_multiple = dp_total // world
    return mesh, rules, batch_multiple, world > 1


# Model-size presets over the same knobs the reference exposes
# (/root/reference/audio8/pretrain.py:39-42): 'base' is the flag
# defaults; 'large' is the wav2vec 2.0 LARGE dims (arXiv 2006.11477
# Table: 24 blocks, d_model 1024, d_ff 4096, 16 heads; final_dim 768
# for the pretraining heads) on the reference's post-norm architecture.
MODEL_PRESETS = {
    "base": {},
    "large": {"d_model": 1024, "d_ff": 4096, "num_heads": 16,
              "num_layers": 24, "final_dim": 768},
    # LV-60k-style large: stable layer norm (pre-norm encoder) +
    # per-block layer-norm extractor with conv bias (arXiv 2006.11477
    # LARGE LV-60; fairseq wav2vec2_large_librivox config). A topology
    # beyond the reference's post-norm-only encoder.
    "large-lv60": {"d_model": 1024, "d_ff": 4096, "num_heads": 16,
                   "num_layers": 24, "final_dim": 768, "pre_norm": True,
                   "extractor_mode": "layer", "conv_bias": True},
    # HuBERT (arXiv 2106.07447) checkpoints load through the same two
    # layouts: hubert-base is exactly the group-norm post-norm base
    # topology; hubert-large is the stable-LN layer-norm-extractor one at
    # LARGE dims (transformers HubertConfig defaults conv_bias=False).
    # NOTE: checkpoint LOADING always takes the topology from the HF
    # config.json (models/convert_hf.load_hf_dir), so this preset only
    # sets from-scratch training defaults — pass --conv_bias to override.
    "hubert-large": {"d_model": 1024, "d_ff": 4096, "num_heads": 16,
                     "num_layers": 24, "final_dim": 768, "pre_norm": True,
                     "extractor_mode": "layer", "conv_bias": False},
    # data2vec-audio (arXiv 2202.03555): post-norm encoder + layer-norm
    # extractor + a 5-deep stack of plain k=19 grouped positional convs
    # (no weight norm) — HF Data2VecAudioConfig defaults. Checkpoint
    # loading takes the actual topology from config.json.
    "data2vec-base": {"extractor_mode": "layer", "pos_conv_depth": 5,
                      "conv_pos_kernel": 19},
    "data2vec-large": {"d_model": 1024, "d_ff": 4096, "num_heads": 16,
                       "num_layers": 24, "final_dim": 768,
                       "extractor_mode": "layer", "pos_conv_depth": 5,
                       "conv_pos_kernel": 19},
    # WavLM (arXiv 2110.13900): wav2vec2 layouts + a gated relative
    # position bias (shared 320-bucket table, per-layer gates). base is
    # the group-norm post-norm layout, large the stable-LN one.
    "wavlm-base": {"gated_rel_pos": True},
    "wavlm-large": {"d_model": 1024, "d_ff": 4096, "num_heads": 16,
                    "num_layers": 24, "final_dim": 768, "pre_norm": True,
                    "extractor_mode": "layer", "gated_rel_pos": True},
    # wav2vec2-conformer (fairseq's conformer variant, distributed via HF:
    # facebook/wav2vec2-conformer-{rope,rel-pos}-large*): macaron conformer
    # blocks (swish, k=31 depthwise conv) with rotary or Transformer-XL
    # relative positions, layer-norm extractor at LARGE dims.
    "conformer-large-rope": {"d_model": 1024, "d_ff": 4096, "num_heads": 16,
                             "num_layers": 24, "final_dim": 768,
                             "extractor_mode": "layer", "conv_bias": True,
                             "encoder_type": "conformer",
                             "position_embeddings_type": "rotary"},
    "conformer-large-rel": {"d_model": 1024, "d_ff": 4096, "num_heads": 16,
                            "num_layers": 24, "final_dim": 768,
                            "extractor_mode": "layer", "conv_bias": True,
                            "encoder_type": "conformer",
                            "position_embeddings_type": "relative"},
}
_PRESET_BASE_DEFAULTS = {"d_model": 768, "d_ff": 3072, "num_heads": 12,
                         "num_layers": 12, "final_dim": 256,
                         "pre_norm": False, "extractor_mode": "group",
                         "conv_bias": False, "pos_conv_depth": 1,
                         "conv_pos_kernel": 128, "gated_rel_pos": False,
                         "rel_pos_buckets": 320,
                         "rel_pos_max_distance": 800,
                         "encoder_type": "transformer",
                         "position_embeddings_type": "relative",
                         "conv_depthwise_kernel_size": 31,
                         "rotary_base": 10000.0,
                         "conformer_activation": "swish"}


def topology_kwargs(args):
    """The encoder-topology flags as config/loader kwargs."""
    return dict(pre_norm=args.pre_norm, extractor_mode=args.extractor_mode,
                conv_bias=args.conv_bias,
                pos_conv_depth=args.pos_conv_depth,
                conv_pos_kernel=args.conv_pos_kernel,
                gated_rel_pos=args.gated_rel_pos,
                rel_pos_buckets=args.rel_pos_buckets,
                rel_pos_max_distance=args.rel_pos_max_distance,
                encoder_type=args.encoder_type,
                position_embeddings_type=args.position_embeddings_type,
                conv_depthwise_kernel_size=args.conv_depthwise_kernel_size,
                rotary_base=args.rotary_base,
                conformer_activation=args.conformer_activation,
                causal_chunk_frames=args.causal_chunk_frames,
                causal_left_chunks=args.causal_left_chunks)


def moe_kwargs(args):
    """The Mixture-of-Experts flags as encoder-config kwargs (every
    step factory threads the sowed Switch aux loss, train/steps.py)."""
    return dict(moe_experts=args.moe_experts, moe_top_k=args.moe_top_k,
                moe_capacity_factor=args.moe_capacity_factor,
                moe_every=args.moe_every,
                moe_aux_weight=args.moe_aux_weight)


def apply_preset(args):
    """Resolve ``--preset``: preset-managed flags parse with a ``None``
    sentinel, so an explicit flag ALWAYS wins (even when set to the base
    default); unset flags take the preset's value, else the base
    default."""
    preset = MODEL_PRESETS[getattr(args, "preset", "base")]
    for key, base_value in _PRESET_BASE_DEFAULTS.items():
        if hasattr(args, key) and getattr(args, key) is None:
            setattr(args, key, preset.get(key, base_value))
    return args


def add_common_model_args(parser):
    parser.add_argument("--preset", choices=sorted(MODEL_PRESETS),
                        default="base",
                        help="model-size preset; individual size flags "
                             "override it")
    parser.add_argument("--tensor_parallel", type=int, default=1,
                        help="devices on the 'model' mesh axis (Megatron-"
                             "style TP over the transformer); the rest go "
                             "to 'data'")
    parser.add_argument("--zero1", type=str2bool, default=False,
                        help="ZeRO-1: shard AdamW moments over the 'data' "
                             "mesh axis (params stay per the TP/DP rules); "
                             "cuts optimizer HBM by the DP extent")
    parser.add_argument("--fsdp", type=str2bool, default=False,
                        help="fully-sharded data parallelism (ZeRO-3): "
                             "params AND AdamW moments shard over the "
                             "'data' mesh axis; XLA all-gathers each "
                             "layer's params before use and reduce-"
                             "scatters its grads. Composes with "
                             "--tensor_parallel; implies --zero1")
    parser.add_argument("--sequence_parallel", type=str2bool, default=False,
                        help="Megatron-SP: shard the frame axis of the "
                             "residual stream over the 'model' mesh axis "
                             "between transformer layers (needs "
                             "--tensor_parallel > 1 to have effect); cuts "
                             "activation HBM for long clips")
    parser.add_argument("--moe_experts", type=int, default=0,
                        help="Mixture-of-Experts FFN: number of experts "
                             "(0 = dense). Expert weights shard over the "
                             "'model' mesh axis (expert parallelism when "
                             "--tensor_parallel > 1)")
    parser.add_argument("--moe_top_k", type=int, default=1,
                        help="experts per token: 1 (Switch) or 2 (GShard)")
    parser.add_argument("--moe_capacity_factor", type=float, default=1.25)
    parser.add_argument("--moe_every", type=int, default=2,
                        help="MoE in every Nth layer (GShard convention)")
    parser.add_argument("--moe_aux_weight", type=float, default=0.01,
                        help="Switch load-balance loss weight")
    parser.add_argument("--d_model", type=int, default=None)
    parser.add_argument("--d_ff", type=int, default=None)
    parser.add_argument("--num_heads", type=int, default=None)
    parser.add_argument("--num_layers", type=int, default=None)
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--attention_dropout", type=float, default=None,
                        help="attention-prob dropout (default: --dropout)")
    parser.add_argument("--layer_drop", type=float, default=0.0)
    parser.add_argument("--pre_norm", type=str2bool, default=None,
                        help="stable-layer-norm (pre-norm) encoder, the "
                             "LV-60/XLSR large topology")
    parser.add_argument("--extractor_mode", choices=["group", "layer"],
                        default=None,
                        help="conv feature extractor norm: 'group' "
                             "(base) or per-block 'layer' (LV-60/XLSR)")
    parser.add_argument("--conv_bias", type=str2bool, default=None)
    parser.add_argument("--pos_conv_depth", type=int, default=None,
                        help=">1: data2vec-audio stacked positional convs "
                             "(plain grouped convs + affine-less LN + GELU) "
                             "instead of the single weight-normed pos-conv")
    parser.add_argument("--conv_pos_kernel", type=int, default=None,
                        help="positional conv kernel size (128 for "
                             "wav2vec2/HuBERT, 19 for data2vec-audio)")
    parser.add_argument("--gated_rel_pos", type=str2bool, default=None,
                        help="WavLM gated relative position bias")
    parser.add_argument("--rel_pos_buckets", type=int, default=None,
                        help="WavLM relative-position buckets (320)")
    parser.add_argument("--rel_pos_max_distance", type=int, default=None,
                        help="WavLM relative-position max distance (800)")
    parser.add_argument("--encoder_type", choices=["transformer", "conformer"],
                        default=None,
                        help="'conformer': macaron conformer blocks "
                             "(wav2vec2-conformer) instead of the "
                             "transformer stack")
    parser.add_argument("--position_embeddings_type",
                        choices=["relative", "rotary", "none"], default=None,
                        help="conformer attention positions (XL-relative "
                             "or rotary)")
    parser.add_argument("--conv_depthwise_kernel_size", type=int,
                        default=None,
                        help="conformer conv-module depthwise kernel (31)")
    parser.add_argument("--rotary_base", type=float, default=None)
    parser.add_argument("--conformer_activation", default=None,
                        help="conformer block activation (swish)")
    parser.add_argument("--causal_chunk_frames", type=int, default=0,
                        help=">0: block-causal streaming attention — each "
                             "conv frame attends to its own chunk (this "
                             "many frames) and earlier chunks only; pair "
                             "with --extractor_mode layer for a streamable "
                             "stack")
    parser.add_argument("--causal_left_chunks", type=int, default=-1,
                        help="cap on how many past chunks attention sees "
                             "under --causal_chunk_frames (-1 = unlimited)")
    parser.add_argument("--remat", type=str2bool, default=False,
                        help="rematerialize transformer layers in backprop "
                             "(jax.checkpoint); ~1 extra fwd of FLOPs for "
                             "O(layers) less activation HBM — for large "
                             "models / long clips")
    parser.add_argument("--input_sample_rate", type=int, default=16_000)
    parser.add_argument("--target_sample_rate", type=int, default=16_000)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (fp32 params)")
