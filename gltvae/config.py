"""Typed configuration for the gated LT-VAE framework.

Replaces the reference's argparse + ad-hoc ``train_config`` dict
(/root/reference/configs.py:4-27, /root/reference/gated_ccvae.py:462-476)
with frozen dataclasses that can be hashed into jit static args.

The reference's broken CLI ``choices`` lists (configs.py:22-23 pass
single-string lists, so 'fixed'/'one-one' were unreachable from the CLI) are
fixed here; the semantics of every reachable configuration are preserved.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

# CelebA attribute vocabularies — mirrors /root/reference/utils_data.py:16-25.
CELEBA_LABELS = (
    '5_o_Clock_Shadow', 'Arched_Eyebrows', 'Attractive', 'Bags_Under_Eyes',
    'Bald', 'Bangs', 'Big_Lips', 'Big_Nose', 'Black_Hair', 'Blond_Hair',
    'Blurry', 'Brown_Hair', 'Bushy_Eyebrows', 'Chubby', 'Double_Chin',
    'Eyeglasses', 'Goatee', 'Gray_Hair', 'Heavy_Makeup', 'High_Cheekbones',
    'Male', 'Mouth_Slightly_Open', 'Mustache', 'Narrow_Eyes', 'No_Beard',
    'Oval_Face', 'Pale_Skin', 'Pointy_Nose', 'Receding_Hairline',
    'Rosy_Cheeks', 'Sideburns', 'Smiling', 'Straight_Hair', 'Wavy_Hair',
    'Wearing_Earrings', 'Wearing_Hat', 'Wearing_Lipstick', 'Wearing_Necklace',
    'Wearing_Necktie', 'Young',
)

CELEBA_EASY_LABELS = (
    'Arched_Eyebrows', 'Bags_Under_Eyes', 'Bangs', 'Black_Hair', 'Blond_Hair',
    'Brown_Hair', 'Bushy_Eyebrows', 'Chubby', 'Eyeglasses', 'Heavy_Makeup',
    'Male', 'No_Beard', 'Pale_Skin', 'Receding_Hairline', 'Smiling',
    'Wavy_Hair', 'Wearing_Necktie', 'Young',
)

GATE_TYPES = ('learnable', 'fixed')
GATE_SUBTYPES = ('one-one', 'inferred')


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture of the gated CCVAE.

    Defaults reproduce the reference CelebA-64 model
    (/root/reference/gated_ccvae.py:23-60, networks.py). The 128px config
    (BASELINE.json config 4) widens/deepens via the tuples below.
    """

    image_size: int = 64
    channels: int = 3
    z_dim: int = 45
    y_dim: int = 18                  # == len(CELEBA_EASY_LABELS)
    # Stride-2 conv feature progression; one extra stage per octave above 8px.
    # 64px: (32, 32, 64, 128) -> 4x4 spatial, then a valid 4x4 conv to 1x1.
    enc_features: Tuple[int, ...] = (32, 32, 64, 128)
    enc_hidden: int = 256            # final valid-conv channels (networks.py:15)
    # Decoder transpose-conv features after the 1x1 -> 4x4 valid deconv.
    dec_features: Tuple[int, ...] = (128, 64, 32, 32)
    # Reference quirk: Decoder(hidden_dim=z_dim) at gated_ccvae.py:34 overrides
    # the Decoder's own 256 default, so fc1 is Dense(45 -> 45).
    dec_hidden: Optional[int] = None  # None -> z_dim (reference semantics)
    gate_type: str = 'learnable'
    gate_subtype: str = 'inferred'
    # Uniform Bernoulli label prior p(y). The reference keeps this as a
    # reassignable variable pinned at 0.5 (gated_ccvae.py:137-141).
    label_prior: float = 0.5
    # Posterior-mean head activation. 'relu' reproduces the reference's
    # unusual NONNEGATIVE posterior means (networks.py:17) — which
    # docs/HEAD2HEAD.md pinned as the cause of the sup=1.0 one-one seed
    # bimodality (symmetry-breaking failure: a unit whose pre-activation
    # mean starts negative is stuck at loc 0 and can never flip sign to
    # align with its label). 'linear' drops the ReLU (standard VAE
    # posterior), removing that plateau basin; opt-in, parity default
    # unchanged.
    posterior_locs: str = 'relu'
    # Space-to-depth input conv: an exact regrouping of the encoder's
    # first conv (pad1 + 4x4/s2 -> s2d(2) + 2x2/s1) that cuts the padded
    # HBM traffic of the 3-channel input (networks.py::S2DConv). Pure
    # execution strategy — same params, same math, same checkpoints.
    input_s2d: bool = False
    # Output-side twin: the decoder's final conv-transpose emits the
    # image in space-to-depth form and recon losses compare in s2d space
    # (networks.py::S2DTransposeLast) — same pixels, half the padded
    # traffic of the (S, S, 3) write+read. decode()/reconstruct()/
    # traversal still return (S, S, 3) images (depth_to_space applied).
    output_s2d: bool = False
    # Compute dtype for conv/matmul-heavy paths. Params always f32.
    compute_dtype: str = 'float32'

    def __post_init__(self):
        if self.gate_type not in GATE_TYPES:
            raise ValueError(f'gate_type must be one of {GATE_TYPES}')
        if self.gate_subtype not in GATE_SUBTYPES:
            raise ValueError(f'gate_subtype must be one of {GATE_SUBTYPES}')
        if self.z_classify > self.z_dim:
            raise ValueError('y_dim (== z_classify) must be <= z_dim')
        if self.posterior_locs not in ('relu', 'linear'):
            raise ValueError("posterior_locs must be 'relu' or 'linear'")
        if (self.input_s2d or self.output_s2d) and self.image_size % 2:
            raise ValueError('input_s2d/output_s2d require an even '
                             'image_size')

    @property
    def z_classify(self) -> int:
        # Reference ties z_classify to the number of labels
        # (gated_ccvae.py:517-519 passes z_classify=n_classes).
        return self.y_dim

    @property
    def z_style(self) -> int:
        return self.z_dim - self.z_classify

    @property
    def mu_trainable(self) -> bool:
        return self.gate_type == 'learnable'

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def matmul_precision(self) -> Optional[str]:
        """f32 mode: force 'highest' so TPU MXU f32 convs don't silently
        degrade to bf16 passes (breaks golden parity with the CPU/TF
        reference). bf16 mode: native MXU precision."""
        return 'highest' if self.compute_dtype == 'float32' else None

    @property
    def input_shape(self) -> Tuple[int, int, int]:
        return (self.image_size, self.image_size, self.channels)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule. Mirrors gated_ccvae.py:462-476 defaults."""

    n_epochs: int = 75
    batch_size: int = 256            # per-replica global batch (sharded over DP mesh)
    lr: float = 1e-4                 # constant — reference never anneals (quirk)
    adam_eps: float = 1e-7           # Keras Adam epsilon (tf.keras default)
    perc_supervision: float = 1.0
    gating_reg: float = 0.2          # L1 coeff on mu (learnable only)
    # BinConcrete temperature: 1.0 for learnable, 0.3 for fixed
    # (gated_ccvae.py:474), decayed x0.99/epoch for learnable (403-406).
    gating_init_temp: Optional[float] = None   # None -> derived from gate_type
    gating_temp_decay: float = 0.99
    eval_gating_temp: float = 0.3    # test-time temperature (gated_ccvae.py:535)
    classifier_mc_samples: int = 100  # k in the q(y|x) marginal (gated_ccvae.py:167)
    seed: int = 0
    # PRNG implementation: 'threefry' (jax default; bit-reproducible
    # across backends, what all goldens/twin tests pin) or 'rbg' (XLA
    # RngBitGenerator — the TPU-fast partitionable generator; measured
    # +6% train step on v5e because threefry's bitwise-op chains compete
    # with the model for issue slots on this bandwidth-bound step).
    prng_impl: str = 'threefry'
    # Improvements over the reference, off by default in parity mode:
    reshuffle_each_epoch: bool = True   # reference shuffles once (utils_data.py:39-40)
    deterministic_eval: bool = False    # reference eval is stochastic (gated_ccvae.py:421-446)
    # Train-time augmentation (framework extension; reference has none):
    # host decodes train images to (S+2*pad), the device does a fused
    # random-crop-to-S + hflip + normalize (ops/pallas/preprocess.py
    # fused_augment). 0 disables. Eval splits are never augmented.
    augment_pad: int = 0
    # Rematerialization of the loss forward inside the backward pass
    # (jax.checkpoint). The train step is HBM-bandwidth-bound on TPU
    # (~94% of roofline) with the MXU far from saturated, so trading
    # activation storage traffic for recompute FLOPs can pay.
    # 'none' = store activations (XLA default), 'full' = save nothing
    # (recompute the whole forward), 'dots' = save matmul/conv outputs
    # only (jax dots_with_no_batch_dims_saveable policy). Same math,
    # float-association-level differences only.
    remat: str = 'none'

    def gating_temp_for(self, model: ModelConfig) -> float:
        if self.gating_init_temp is not None:
            return self.gating_init_temp
        return 1.0 if model.gate_type == 'learnable' else 0.3


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """CelebA pipeline config. Mirrors /root/reference/utils_data.py:83-196."""

    data_dir: str = './data'
    image_dir: str = 'img_align_celeba'
    attr_file: str = 'list_attr_celeba.csv'
    image_size: int = 64
    # Official CelebA split sizes (utils_data.py:87-91).
    n_train: int = 162770
    n_valid: int = 19867
    n_test: int = 19962
    # Official split-assignment file (image_id,partition with 0=train,
    # 1=valid, 2=test). The reference SHIPS list_eval_partition.csv but
    # ignores it, hardcoding the sizes above (utils_data.py:87-91) —
    # correct only when the attr CSV is in official order. Set this
    # (path relative to data_dir) to split by the file instead; the
    # n_train/n_valid/n_test sizes are then ignored.
    split_file: Optional[str] = None
    use_easy_labels: bool = True     # 18 labels; False -> all 40 (128px config)
    # Square center-crop before resize. False reproduces the reference's
    # aspect-distorting direct resize (utils_data.py:57); the 128px CLI
    # config turns it on (BASELINE north star names crop in the pipeline).
    center_crop: bool = False
    prefetch_batches: int = 4
    num_workers: int = 8
    # Host decode backend: 'auto' picks cv2 (fastest pure-Python) with a
    # PIL fallback; 'native' is the C++ libjpeg pool (native/loader.cpp,
    # decodes a whole batch in parallel outside the GIL); 'grain' is the
    # Google Grain pipeline (deterministic, process-parallel,
    # host-shardable for multi-host DP).
    decode_backend: str = 'auto'
    # (uint8 ship + device-side normalize is unconditional: every loader
    # yields uint8 and the train step dequantizes on device.)
    # Ship full-resolution uint8 (178x218 CelebA) and bilinear-resize on
    # device inside the train/eval jit (MXU matmuls) instead of host
    # cv2/PIL resize. Costs ~10x PCIe bytes at 64px — benched honestly in
    # tools/bench_data.py / docs/BENCH_NOTES.md; host resize stays the
    # default. (BASELINE.json north star: decode+crop+resize+normalize
    # fused on device.)
    device_resize: bool = False
    # Train-split host decode target becomes image_size + 2*augment_pad
    # (see TrainConfig.augment_pad; the device crops back to image_size).
    augment_pad: int = 0
    # Keep every decoded uint8 image in host RAM after its first decode
    # (tf.data.cache() counterpart). Epoch 1 pays the JPEG decode; later
    # epochs serve from memory at memcpy speed, removing the host-decode
    # bottleneck documented in docs/BENCH_NOTES.md. Full CelebA-64 uint8
    # is ~1.9 GB, 128px ~7.6 GB. cv2/pil/native backends only (grain
    # manages its own pipeline).
    cache_decoded: bool = False
    # Disk-PERSISTENT decoded cache (tf.data cache(filename=...)
    # counterpart): decoded uint8 rows stream into np.memmap files under
    # this directory, keyed by split image list + decode size; later RUNS
    # (any process, any backend) serve at page-cache speed with zero JPEG
    # work (celeba.py::DiskCachedDataset). cv2/pil/native backends only.
    cache_dir: Optional[str] = None


MODEL_CONFIG_FILENAME = 'model_config.json'


def save_model_config(cfg: ModelConfig, run_dir: str) -> str:
    """Persist the ModelConfig next to a run's checkpoints so offline tools
    (tools/infer.py, tools/export_h5.py) can rebuild the exact restore
    template — a non-default --z-dim otherwise surfaces as an opaque Orbax
    tree-mismatch error."""
    import json
    import os
    path = os.path.join(run_dir, MODEL_CONFIG_FILENAME)
    with open(path, 'w') as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, sort_keys=True)
    return path


def load_model_config(run_dir: str) -> Optional[ModelConfig]:
    """ModelConfig recorded by train.py in `run_dir`, or None if absent
    (pre-round-3 runs; callers fall back to CLI flags)."""
    import json
    import os
    path = os.path.join(run_dir, MODEL_CONFIG_FILENAME)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    for k in ('enc_features', 'dec_features'):
        if k in d and d[k] is not None:
            d[k] = tuple(d[k])
    return ModelConfig(**d)


def default_celeba64(gate_type: str = 'learnable',
                     gate_subtype: str = 'inferred',
                     sup: float = 1.0,
                     **overrides) -> tuple[ModelConfig, TrainConfig]:
    """The reference's headline configuration set (BASELINE.json configs 1-3)."""
    model = ModelConfig(gate_type=gate_type, gate_subtype=gate_subtype)
    train = TrainConfig(perc_supervision=sup, **overrides)
    return model, train


def celeba128(gate_type: str = 'learnable', sup: float = 1.0,
              gate_subtype: str = 'inferred',
              **overrides) -> tuple[ModelConfig, TrainConfig]:
    """128x128, full 40-attribute label space, widened latent
    (BASELINE.json config 4). One extra stride-2 stage keeps the final
    valid 4x4 conv at 1x1 spatial."""
    model = ModelConfig(
        image_size=128,
        z_dim=100,
        y_dim=40,
        enc_features=(32, 32, 64, 128, 256),
        enc_hidden=512,
        dec_features=(256, 128, 64, 32, 32),
        dec_hidden=256,
        gate_type=gate_type,
        gate_subtype=gate_subtype,
    )
    train = TrainConfig(perc_supervision=sup, **overrides)
    return model, train


def v5p8_sweep(**overrides) -> list:
    """Data-parallel sweep on a v5p-8 (8-chip) mesh: all gating modes x
    sup fractions {0.2, 0.5, 1.0} at global batch 4096 with on-device
    preprocessing (BASELINE.json config 5). Run each entry via
    `train.py --mesh -bs 4096 --gate-type ... --sup ...`; uint8 batches
    are host-sharded over the mesh (parallel/dp.py::shard_batch) and
    normalized on device. Returns (name, ModelConfig, TrainConfig)
    triples.

    The reference has no distributed slot at all (SURVEY.md §2); this is
    the framework's scaling config. Proven shape-for-shape by an
    AOT-compile test over an 8-device mesh (tests/test_v5p8_config.py)
    and executed at tiny shapes by __graft_entry__.dryrun_multichip.
    """
    gate_modes = [('learnable', 'inferred'), ('fixed', 'inferred'),
                  ('fixed', 'one-one')]
    out = []
    for gate_type, gate_subtype in gate_modes:
        for sup in (0.2, 0.5, 1.0):
            model = ModelConfig(gate_type=gate_type,
                                gate_subtype=gate_subtype,
                                compute_dtype='bfloat16')
            train = TrainConfig(perc_supervision=sup, batch_size=4096,
                                **overrides)
            name = (f'v5p8_{gate_type}'
                    + ('' if gate_type == 'learnable' else f'_{gate_subtype}')
                    + f'_sup{sup}')
            out.append((name, model, train))
    return out
