"""One shared configuration dataclass for every entry point.

The reference duplicates ~30 argparse flags across three CLIs with drifted
defaults (reference train_model.py:160-242, eval.py:139-223,
equivariance_test.py:20-94). Here a single frozen dataclass is the source of
truth; it is serialized into checkpoints so that eval can never silently
mismatch the training architecture (fixes the manual caveat at reference
README.md:150).

Every reference flag is carried except `--gpu` (a CUDA_VISIBLE_DEVICES
selector, train_model.py:86 — meaningless here; device placement is the
jax runtime's job and multi-device use goes through `mesh_shape`). Extra
fields beyond the reference are the TPU-native capabilities: mesh_shape/
mesh_axes (DP over ICI), dtype (bf16 compute), remat, bucket_sizes,
use_pallas_cqt, cqt_conv_dtype, early_stop_patience, seed, data_root,
log_dir.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any


@dataclass(frozen=True)
class Config:
    # ---- optimization (reference train_model.py:166-179) ----
    batch_size: int = 8
    lr: float = 3e-4
    drop: float = 0.0
    reg: float = 0.0            # Adam weight decay
    gamma: float = 0.96         # exponential LR decay per epoch
    acc_grad: int = 8           # gradient accumulation (microbatches per step)
    epochs: int = 100
    early_stop_patience: int = 10

    # ---- front-end / CQT (reference KeyDataset.py:469-509) ----
    window_size: int = 592      # time frames when frames == 0
    octaves: int = 8
    frames: int = 5             # CQT frames per second (hop = round(sr/frames))
    only_semitones: bool = False  # 12 bins/octave instead of 36
    multi_scale: bool = False     # run 36-bin and 12-bin models, merge outputs

    # ---- architecture (reference train_model.py:188-219) ----
    conv_layers: int = 3
    n_filters: int = 4
    num_layers: int = 2
    kernel_size: int = 7
    head_layers: int = 2
    time_pool_size: int = 2
    resblock: bool = False
    denseblock: bool = False
    stay_sixth: bool = False
    p2pc_conv: bool = False
    pc2p_mem: bool = False
    max_pool: bool = False      # global max-pool at heads instead of mean
    linear_reg_multi: bool = False

    # ---- tasks & loss ----
    local: bool = False         # per-window (local) key estimation
    loc_window_size: int = 10   # seconds per local prediction
    # training-loss weight on windows that straddle a modulation boundary
    # (their single label covers only part of the audio they see —
    # KeyDataset.py:379-412's half-window majority rule). 1.0 = reference
    # behavior; 0.0 masks them out of the local loss entirely. Validation
    # metrics always score every valid window regardless.
    straddle_weight: float = 1.0
    genre: bool = False         # add genre head/loss
    key_weight: float = 1.0
    tonic_weight: float = 1.0
    genre_weight: float = 0.1
    use_cos: bool = False       # extra cosine-similarity key loss term

    # ---- run control ----
    no_test: bool = False
    debug: bool = False
    no_ckpt: bool = False
    seed: int = 0

    # ---- TPU-native knobs (new; no reference counterpart) ----
    # mixed precision: parameters are always stored float32; `dtype`
    # selects the compute path (bfloat16 halves activation HBM traffic)
    dtype: str = "float32"         # compute dtype: float32 | bfloat16
    mesh_shape: tuple = ()          # e.g. (8,) for 8-way data parallel; () = all devices
    mesh_axes: tuple = ("data",)
    remat: bool = False             # jax.checkpoint the trunk (dense blocks use it anyway)
    bucket_sizes: tuple = (512, 1024, 2048, 4096)  # time-frame padding buckets
    # CQT front-end implementation: "auto" = the fused Pallas kernel on
    # TPU (it beats the XLA path there — PERFNOTES.md), XLA elsewhere;
    # "on"/"off" force it (off-TPU "on" runs the kernel in interpret
    # mode: test rigs only). Legacy checkpoints with booleans load fine.
    use_pallas_cqt: Any = "auto"    # "auto" | "on" | "off" (bool accepted)
    # CQT response-conv operand storage. bf16 halves the front-end's HBM
    # traffic at <0.2% relative feature error (the TPU MXU decomposes f32
    # convs to bf16 operands anyway); float32 is the oracle-pinned path.
    cqt_conv_dtype: str = "bfloat16"  # bfloat16 | float32
    # Eval-only fused Pallas serving kernel for plain Pitch2Pitch
    # ConvStacks (ops/convstack_pallas.py): folds conv+BN+leaky into one
    # MXU-matmul-per-block kernel with bf16 streams. Engages only at
    # supported geometry (B%128==0, H%4==0, kernel 7, widths <= 8) in
    # eval mode; training and init always run the plain XLA path, so
    # checkpoints are identical either way. Serving/bench knob.
    fused_convstack: bool = False
    data_root: str = "../Data"
    log_dir: str = "Model_logs"

    # ------------------------------------------------------------------
    @property
    def bins_per_octave(self) -> int:
        return 12 if self.only_semitones else 36

    @property
    def pitches(self) -> int:
        """Input CQT height (reference train_model.py:93-98)."""
        return self.octaves * self.bins_per_octave

    @property
    def pitch_classes(self) -> int:
        return 12

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def pallas_cqt_enabled(self, platform: str | None = None) -> bool:
        """Resolve use_pallas_cqt against the execution platform.

        platform=None queries the default jax backend. Used by dataset
        preprocessing, serving and bench (and as the feature-cache
        variant key, so caches computed under different backends never
        collide)."""
        v = self.use_pallas_cqt
        if isinstance(v, str):
            v = v.strip().lower()
        if v in ("auto", None):
            if platform is None:
                import jax
                platform = jax.devices()[0].platform
            return platform == "tpu"
        if v in (True, "on", "true", "1"):
            return True
        if v in (False, "off", "false", "0"):
            return False
        raise ValueError(
            f"use_pallas_cqt={self.use_pallas_cqt!r}: expected "
            "'auto' | 'on' | 'off' (or a boolean)")

    # ---- (de)serialization: stored inside every checkpoint ----
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        for k, v in d.items():
            if isinstance(v, tuple):
                d[k] = list(v)
        return json.dumps(d, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        fields = {f.name: f for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in d.items():
            if k not in fields:
                continue
            if fields[k].type == "tuple" or isinstance(fields[k].default, tuple):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)


# Fields that belong to the RUN, not to the trained model: when evaluating
# a checkpoint these always come from the command line, while every
# architecture / feature / loss field comes from the checkpoint's saved
# config (so eval can never silently mismatch the weights).
RUNTIME_FIELDS = frozenset({
    "data_root", "log_dir", "batch_size", "no_test", "debug",
    "bucket_sizes", "mesh_shape", "mesh_axes", "use_pallas_cqt",
    "cqt_conv_dtype", "dtype", "remat", "fused_convstack", "no_ckpt", "epochs",
    "early_stop_patience", "seed",
})


def merge_eval_config(cli_cfg: "Config", saved_cfg: "Config") -> "Config":
    """Checkpoint config wins for model-defining fields; CLI wins for
    runtime fields (fixes silently resurrecting the training run's
    data_root/log_dir/debug flags at eval time)."""
    kw = {f.name: getattr(saved_cfg, f.name)
          for f in dataclasses.fields(Config)}
    for name in RUNTIME_FIELDS:
        kw[name] = getattr(cli_cfg, name)
    return Config(**kw)


def add_config_args(parser) -> None:
    """Expose every Config field as a --flag on an argparse parser."""
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        if f.name == "use_pallas_cqt":
            # tri-state: bare `--use_pallas_cqt` keeps its historical
            # store_true meaning ("on"); otherwise takes auto|on|off
            parser.add_argument(name, nargs="?", const="on",
                                default=f.default,
                                choices=["auto", "on", "off"])
        elif f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(name, action="store_true", default=f.default)
        elif isinstance(f.default, tuple):
            # element type from the default when non-empty (mesh_axes is a
            # tuple of strings), int for empty tuples (mesh_shape)
            elem = (type(f.default[0]) if f.default else int)
            parser.add_argument(
                name,
                type=lambda s, e=elem: tuple(e(x) for x in s.split(","))
                if s else (),
                default=f.default)
        else:
            parser.add_argument(name, type=type(f.default), default=f.default)


def config_from_args(args) -> Config:
    kw = {f.name: getattr(args, f.name) for f in dataclasses.fields(Config)
          if hasattr(args, f.name)}
    return Config(**kw)
