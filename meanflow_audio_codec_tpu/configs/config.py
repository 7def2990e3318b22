"""Hierarchical, validated configuration system.

TPU-native re-design of the reference config layer
(reference: meanflow_audio_codec/configs/config.py:15-1117). Preserves the
on-disk contract — v1 flat JSON and v2 hierarchical JSON
(``{config_version, base, model, dataset, method, training}``) with
transparent v1->v2 migration, eager cross-field validation, deep merge,
diff, schema export and markdown documentation — while adding a purely
additive ``tpu`` section that configures the mesh / precision / remat
policy used by the jit-compiled training step.

Design differences from the reference (intentional, TPU-first):
  * Sections share one declarative machinery (``Section``) instead of five
    hand-rolled copies of ``to_dict``/``get_schema``.
  * Flat backward-compat access (``config.batch_size`` etc., reference
    config.py:528-705) is provided by attribute delegation instead of ~50
    property definitions.
  * A ``TPUConfig`` section (mesh axes, precision, remat, donation) feeds
    the sharded train step; absent in the reference, defaulted so every
    reference config loads unchanged.
  * Fixes the reference's swapped default workdir names
    (reference config.py:889,940).
"""

from __future__ import annotations

import json
import warnings
from dataclasses import MISSING, dataclass, field, fields
from pathlib import Path
from typing import Any

# ============================================================================
# Declarative section machinery
# ============================================================================

#: name -> allowed values, used by validate() and get_schema()
_CHOICES: dict[str, list[str]] = {
    "architecture": ["mlp", "mlp_mixer", "convnet", "simple_conv"],
    "dataset": ["mnist", "audio", "synthetic"],
    "tokenization_strategy": ["mdct", "reshape"],
    "method": ["autoencoder", "flow_matching", "mean_flow", "improved_mean_flow"],
    "loss_strategy": ["flow_matching", "mean_flow", "improved_mean_flow"],
    "noise_schedule": ["linear", "uniform"],
    "time_sampling": ["uniform", "logit_normal", "mean_flow"],
    "loss_weighting": ["uniform", "time_dependent", "learned"],
    "qat_mode": ["ste", "noise"],
    "precision": ["float32", "bfloat16", "mixed"],
    "checkpoint_format": ["msgpack", "orbax"],
}


@dataclass
class Section:
    """Base class for config sections: serialisation + schema from fields."""

    def to_dict(self) -> dict:
        out: dict[str, Any] = {}
        for f in fields(self):
            value = getattr(self, f.name)
            if value is None and f.default is None:
                continue  # omit optional unset fields, matching reference JSON
            if value is None:
                continue
            out[f.name] = str(value) if isinstance(value, Path) else value
        return out

    def get_schema(self) -> dict:
        schema: dict[str, Any] = {}
        for f in fields(self):
            entry: dict[str, Any] = {
                "type": str(f.type),
                "required": f.default is MISSING and f.default_factory is MISSING,
                "default": None if f.default in (MISSING, None) else f.default,
            }
            if f.name in _CHOICES:
                entry["allowed_values"] = list(_CHOICES[f.name])
            schema[f.name] = entry
        return schema

    # ---- validation helpers -------------------------------------------------
    def _check_choice(self, name: str) -> None:
        value = getattr(self, name)
        if value is not None and value not in _CHOICES[name]:
            raise ValueError(
                f"{name} must be one of {_CHOICES[name]}, got {value!r}"
            )

    def _check_positive(self, *names: str) -> None:
        for name in names:
            value = getattr(self, name)
            if value is not None and value <= 0:
                raise ValueError(f"{name} must be > 0, got {value}")

    def _check_nonnegative(self, *names: str) -> None:
        for name in names:
            value = getattr(self, name)
            if value is not None and value < 0:
                raise ValueError(f"{name} must be >= 0, got {value}")

    def validate(self) -> None:  # overridden by sections that need it
        pass


# ============================================================================
# Sections
# ============================================================================


@dataclass
class BaseConfig(Section):
    """Core optimisation parameters (reference config.py:15-49)."""

    batch_size: int
    n_steps: int
    base_lr: float
    weight_decay: float
    seed: int
    #: global-norm gradient clip (None disables) — stabilises bf16 mean-flow
    #: JVP training, which occasionally spikes (no reference counterpart).
    grad_clip_norm: float | None = None
    #: linear LR warmup steps (0 disables).
    warmup_steps: int = 0
    #: LR decay after warmup: "constant" or "cosine" (decays to
    #: lr_final_fraction * base_lr over the remaining n_steps).
    lr_schedule: str = "constant"
    lr_final_fraction: float = 0.0

    def validate(self) -> None:
        self._check_positive("batch_size", "n_steps", "base_lr")
        self._check_nonnegative("weight_decay", "warmup_steps")
        if self.grad_clip_norm is not None and self.grad_clip_norm <= 0:
            raise ValueError(
                f"grad_clip_norm must be positive, got {self.grad_clip_norm}")
        if self.lr_schedule not in ("constant", "cosine"):
            raise ValueError(
                f"lr_schedule must be 'constant' or 'cosine', "
                f"got {self.lr_schedule!r}")
        if not 0.0 <= self.lr_final_fraction <= 1.0:
            raise ValueError(
                f"lr_final_fraction must be in [0, 1], "
                f"got {self.lr_final_fraction}")


@dataclass
class ModelConfig(Section):
    """Architecture parameters (reference config.py:52-101)."""

    noise_dimension: int
    condition_dimension: int
    latent_dimension: int
    num_blocks: int
    architecture: str | None = None
    #: family-specific sizing passed through to the model builder, e.g.
    #: convnet {"channels", "bottleneck_dim", "spatial", "lift_channels",
    #: "remat"} or mixer {"num_channels", "stage_tokens",
    #: "factorized_stages"}. No reference counterpart (its factory took
    #: no sizing at all).
    architecture_options: dict | None = None

    def validate(self) -> None:
        self._check_positive(
            "noise_dimension", "condition_dimension", "latent_dimension", "num_blocks"
        )
        if self.condition_dimension % 2 != 0:
            raise ValueError(
                f"condition_dimension must be even, got {self.condition_dimension}"
            )
        self._check_choice("architecture")
        if (self.architecture_options is not None
                and not isinstance(self.architecture_options, dict)):
            raise ValueError(
                "architecture_options must be a dict, got "
                f"{type(self.architecture_options).__name__}")


@dataclass
class DatasetConfig(Section):
    """Data source + tokenization wiring (reference config.py:104-149)."""

    dataset: str | None = None
    data_dir: str | None = None
    tokenization_strategy: str | None = None
    tokenization_config: dict | None = None
    #: polyphase-resample off-rate corpus files to 44.1 kHz instead of
    #: dropping them (reference parity is drop, audio.py:246-251); no
    #: reference counterpart — its loader had no resampler.
    resample_audio: bool = False

    def validate(self) -> None:
        self._check_choice("dataset")
        self._check_choice("tokenization_strategy")


@dataclass
class MethodConfig(Section):
    """Objective / schedule / time-sampling knobs (reference config.py:152-257)."""

    method: str | None = None
    use_improved_mean_flow: bool = False
    gamma: float | None = None
    flow_ratio: float | None = None
    c: float | None = None
    use_stop_gradient: bool | None = None
    loss_weighting: str | None = None
    loss_strategy: str | None = None
    noise_schedule: str | None = None
    noise_min: float | None = None
    noise_max: float | None = None
    time_sampling: str | None = None
    time_sampling_mean: float | None = None
    time_sampling_std: float | None = None
    time_sampling_data_proportion: float | None = None
    #: fraction of each batch forced to the exact (t=1, r=0) pair — the
    #: query a 1-NFE decode evaluates (ops/time_sampling.sample_tr)
    time_sampling_full_proportion: float | None = None
    use_weighted_loss: bool | None = None
    #: quantization-aware training of the stored latent format
    #: (ops/latent_quant.LatentQAT): ``qat_step_frac`` trains through the
    #: rate-aware ECSQ grid (MACB v2), ``qat_bits`` through the fixed-width
    #: grid (MACB v1); set at most one. ``qat_mode``: 'ste' (default,
    #: exact eval grid, straight-through backward) | 'noise' (additive
    #: uniform one-step noise).
    qat_mode: str | None = None
    qat_step_frac: float | None = None
    qat_bits: int | None = None

    def validate(self) -> None:
        for name in ("method", "loss_strategy", "noise_schedule",
                     "time_sampling", "loss_weighting", "qat_mode"):
            self._check_choice(name)
        self._check_positive("gamma", "flow_ratio", "c", "time_sampling_std",
                             "qat_step_frac")
        if self.qat_step_frac is not None and self.qat_bits is not None:
            raise ValueError("set at most one of qat_step_frac / qat_bits")
        if self.qat_bits is not None and self.qat_bits not in (4, 8, 16):
            raise ValueError(f"qat_bits must be 4, 8 or 16, got {self.qat_bits}")
        if self.noise_min is not None and not (0 <= self.noise_min < 1):
            raise ValueError(f"noise_min must be in [0, 1), got {self.noise_min}")
        if self.noise_max is not None and not (0 < self.noise_max <= 1):
            raise ValueError(f"noise_max must be in (0, 1], got {self.noise_max}")
        if (self.noise_min is not None and self.noise_max is not None
                and self.noise_min >= self.noise_max):
            raise ValueError(
                f"noise_min ({self.noise_min}) must be < noise_max ({self.noise_max})"
            )
        if self.time_sampling_data_proportion is not None and not (
                0 <= self.time_sampling_data_proportion <= 1):
            raise ValueError(
                "time_sampling_data_proportion must be in [0, 1], "
                f"got {self.time_sampling_data_proportion}"
            )
        if self.time_sampling_full_proportion is not None and not (
                0 <= self.time_sampling_full_proportion <= 1):
            raise ValueError(
                "time_sampling_full_proportion must be in [0, 1], "
                f"got {self.time_sampling_full_proportion}"
            )
        # unset data proportion defaults to flow_ratio, else 0.5, at runtime
        # (training/objectives.py:260-263) — validate the EFFECTIVE value so
        # an over-full batch cannot pass validation and then be silently
        # clipped by sample_tr
        effective_data = self.time_sampling_data_proportion
        if effective_data is None:
            effective_data = (self.flow_ratio
                              if self.flow_ratio is not None else 0.5)
        if effective_data + (self.time_sampling_full_proportion or 0) > 1:
            raise ValueError(
                "time_sampling_data_proportion (effective "
                f"{effective_data}, default 0.5 when unset) + "
                "time_sampling_full_proportion must not exceed 1"
            )
        if self.method == "improved_mean_flow" and not self.use_improved_mean_flow:
            raise ValueError(
                "method='improved_mean_flow' requires use_improved_mean_flow=True"
            )


@dataclass
class TrainingConfig(Section):
    """Run infrastructure (reference config.py:260-306)."""

    sample_every: int
    sample_seed: int
    sample_steps: int
    workdir: Path | None = None
    checkpoint_step: int | None = None
    max_checkpoints_to_keep: int | None = None
    checkpoint_format: str | None = None
    #: model-weight EMA decay (None disables; samplers prefer EMA params)
    ema_decay: float | None = None
    #: classifier-free guidance scale for periodic sampling (1.0 = off)
    sample_guidance_scale: float | None = None

    def __post_init__(self) -> None:
        if isinstance(self.workdir, str):
            self.workdir = Path(self.workdir)

    def validate(self) -> None:
        self._check_positive(
            "sample_every", "sample_steps", "checkpoint_step", "max_checkpoints_to_keep"
        )
        self._check_choice("checkpoint_format")
        if self.ema_decay is not None and not (0.0 < self.ema_decay < 1.0):
            raise ValueError(
                f"ema_decay must be in (0, 1), got {self.ema_decay}")


@dataclass
class TPUConfig(Section):
    """TPU execution policy — additive section, no reference counterpart.

    Controls the mesh layout, numeric precision and memory policy of the
    jit-compiled train step. Every field has a default so reference configs
    (which lack this section) load unchanged.
    """

    #: mesh axis sizes; -1 on the data axis means "all remaining devices".
    mesh_data: int = -1
    mesh_model: int = 1
    #: compute precision. "mixed" = bf16 activations / f32 params+reductions.
    precision: str = "mixed"
    #: rematerialise decoder blocks in the backward pass to save HBM.
    remat: bool = False
    #: donate state buffers into the train step (saves one params copy in HBM).
    donate: bool = True
    #: train steps per device call (lax.scan); >1 amortises host dispatch.
    steps_per_call: int = 1
    #: drop updates whose loss/grads are NaN or inf (in-graph select).
    skip_nonfinite_updates: bool = False

    def validate(self) -> None:
        self._check_choice("precision")
        self._check_positive("mesh_model", "steps_per_call")
        if self.mesh_data == 0:
            raise ValueError("mesh_data must be -1 or positive, got 0")


# Dataset-specialised constructors (reference config.py:314-340).

def MNISTConfig(**kwargs) -> DatasetConfig:
    kwargs.setdefault("tokenization_strategy", "reshape")
    kwargs["dataset"] = "mnist"
    return DatasetConfig(**kwargs)


def AudioConfig(**kwargs) -> DatasetConfig:
    kwargs.setdefault("tokenization_strategy", "mdct")
    kwargs["dataset"] = "audio"
    return DatasetConfig(**kwargs)


# ============================================================================
# Top-level config
# ============================================================================

_SECTION_TYPES: dict[str, type] = {
    "base": BaseConfig,
    "model": ModelConfig,
    "dataset": DatasetConfig,
    "method": MethodConfig,
    "training": TrainingConfig,
    "tpu": TPUConfig,
}

#: flat attribute -> section holding it, for backward-compat access
_FLAT_LOOKUP: dict[str, str] = {}
for _section_name, _section_type in _SECTION_TYPES.items():
    for _f in fields(_section_type):
        _FLAT_LOOKUP.setdefault(_f.name, _section_name)
# 'dataset' and 'method' flat names collide with section names; flat access
# must return the *name string* like the reference (config.py:580-606).
_FLAT_LOOKUP["dataset"] = "dataset"
_FLAT_LOOKUP["method"] = "method"


class TrainFlowConfig:
    """Complete training configuration (reference config.py:348-705).

    Sections are reachable as ``config.base`` / ``config.model`` /
    ``config.dataset_config`` / ``config.method_config`` / ``config.training``
    / ``config.tpu``; every leaf field is also reachable flat
    (``config.batch_size``, ``config.gamma``, ...). ``config.dataset`` and
    ``config.method`` return the *names* for reference compatibility.
    """

    def __init__(
        self,
        base: BaseConfig,
        model: ModelConfig,
        dataset: DatasetConfig,
        method: MethodConfig,
        training: TrainingConfig,
        tpu: TPUConfig | None = None,
        output_dir: Path | None = None,
        run_name: str | None = None,
        config_version: str = "2.0",
    ):
        self.base = base
        self.model = model
        self.dataset_config = dataset
        self.method_config = method
        self.training = training
        self.tpu = tpu if tpu is not None else TPUConfig()
        self.output_dir = Path(output_dir) if output_dir is not None else None
        self.run_name = run_name
        self.config_version = config_version
        self._finalize()

    # ---- deprecated output_dir/run_name -> workdir (reference :384-407) ----
    def _finalize(self) -> None:
        if self.training.workdir is None:
            if self.output_dir is None:
                raise ValueError("Either workdir or output_dir must be provided")
            warnings.warn(
                "output_dir and run_name are deprecated. Use workdir instead.",
                DeprecationWarning,
                stacklevel=3,
            )
            if self.run_name is not None:
                run_name = self.run_name
            else:
                tag = "improved" if self.method_config.use_improved_mean_flow else "baseline"
                run_name = f"seed{self.base.seed}_{tag}"
            self.training.workdir = self.output_dir / run_name
        self.validate()

    def validate(self) -> None:
        for section in (self.base, self.model, self.dataset_config,
                        self.method_config, self.training, self.tpu):
            section.validate()

    # ---- flat backward-compat access ----------------------------------------
    def __getattr__(self, name: str):
        # Only reached when normal attribute lookup fails.
        section_name = _FLAT_LOOKUP.get(name)
        if section_name is None:
            raise AttributeError(f"TrainFlowConfig has no attribute {name!r}")
        if name == "dataset":
            return self.__dict__["dataset_config"].dataset
        if name == "method":
            return self.__dict__["method_config"].method
        holder = {"base": "base", "model": "model", "training": "training",
                  "tpu": "tpu", "dataset": "dataset_config",
                  "method": "method_config"}[section_name]
        return getattr(self.__dict__[holder], name)

    # ---- serialisation -------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "config_version": self.config_version,
            "base": self.base.to_dict(),
            "model": self.model.to_dict(),
            "dataset": self.dataset_config.to_dict(),
            "method": self.method_config.to_dict(),
            "training": self.training.to_dict(),
            "tpu": self.tpu.to_dict(),
        }

    @classmethod
    def from_dict(cls, data: dict) -> "TrainFlowConfig":
        is_flat = "base" not in data and any(
            k in data for k in ("batch_size", "n_steps", "base_lr")
        )
        if is_flat:
            data = migrate_config_v1_to_v2(data)
        if "base" not in data:
            raise ValueError("Invalid config format: expected hierarchical structure")

        sections: dict[str, Section] = {}
        for name, section_type in _SECTION_TYPES.items():
            if name == "tpu":
                sections[name] = TPUConfig(**data.get("tpu", {}))
            elif name in ("dataset", "method") and name not in data:
                sections[name] = section_type()
            else:
                sections[name] = section_type(**data[name])

        out = cls(
            base=sections["base"],
            model=sections["model"],
            dataset=sections["dataset"],
            method=sections["method"],
            training=sections["training"],
            tpu=sections["tpu"],
            output_dir=Path(data["output_dir"]) if data.get("output_dir") else None,
            run_name=data.get("run_name"),
        )
        out.config_version = data.get("config_version", "2.0")
        return out

    # ---- schema / documentation (reference :486-525) -------------------------
    def get_schema(self) -> dict:
        return {
            "config_version": self.config_version,
            "base": self.base.get_schema(),
            "model": self.model.get_schema(),
            "dataset": self.dataset_config.get_schema(),
            "method": self.method_config.get_schema(),
            "training": self.training.get_schema(),
            "tpu": self.tpu.get_schema(),
        }

    def get_documentation(self) -> str:
        lines = ["# TrainFlowConfig Documentation", "",
                 f"Config Version: {self.config_version}", ""]
        for section_name, section in [
            ("Base", self.base), ("Model", self.model),
            ("Dataset", self.dataset_config), ("Method", self.method_config),
            ("Training", self.training), ("TPU", self.tpu),
        ]:
            lines.append(f"## {section_name}Config")
            lines.append("")
            for field_name, info in section.get_schema().items():
                lines.append(f"- `{field_name}`: {info['type']}")
                if info.get("allowed_values"):
                    lines.append(
                        f"  - Allowed values: {', '.join(info['allowed_values'])}"
                    )
                if info["default"] is not None:
                    lines.append(f"  - Default: {info['default']}")
                lines.append("")
        return "\n".join(lines)


# ============================================================================
# Migration (reference config.py:713-816)
# ============================================================================

_V1_SECTION_KEYS: dict[str, tuple[str, ...]] = {
    "base": ("batch_size", "n_steps", "base_lr", "weight_decay", "seed"),
    "model": ("noise_dimension", "condition_dimension", "latent_dimension",
              "num_blocks", "architecture"),
    "dataset": ("dataset", "data_dir", "tokenization_strategy",
                "tokenization_config"),
    # derived from the dataclass so new method knobs (e.g. the QAT set)
    # survive v1 flat configs without a second hand-maintained list
    "method": tuple(_f.name for _f in fields(MethodConfig)),
    "training": ("sample_every", "sample_seed", "sample_steps", "workdir",
                 "checkpoint_step", "max_checkpoints_to_keep",
                 "checkpoint_format", "ema_decay", "sample_guidance_scale"),
    "tpu": ("mesh_data", "mesh_model", "precision", "remat", "donate",
            "steps_per_call"),
}


def migrate_config_v1_to_v2(data: dict) -> dict:
    """Lift a flat v1 config dict into the hierarchical v2 layout."""
    result: dict[str, Any] = {"config_version": "2.0"}
    for section, keys in _V1_SECTION_KEYS.items():
        picked = {k: data[k] for k in keys if k in data}
        if section == "method":
            picked.setdefault("use_improved_mean_flow", False)
        if picked or section in ("base", "model", "training", "method"):
            result[section] = picked
    for passthrough in ("output_dir", "run_name"):
        if passthrough in data:
            result[passthrough] = data[passthrough]
    return result


# ============================================================================
# Merge / diff (reference config.py:824-853, 963-1022)
# ============================================================================


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for key, value in override.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = value
    return out


def merge_configs(base: TrainFlowConfig, override: dict) -> TrainFlowConfig:
    """Deep-merge an override dict (flat or hierarchical) into a config.

    Flat keys are lifted into their owning section via ``_FLAT_LOOKUP``
    (the same table that backs flat attribute access), so *every* section
    field — not just the v1-era trio — works as a kwargs override.
    """
    if "base" not in override:
        lifted: dict[str, Any] = {}
        for key, value in override.items():
            section = _FLAT_LOOKUP.get(key)
            # 'dataset'/'method' double as section names: only a dict is
            # the hierarchical section; a string is the flat field.
            if section is not None and not (
                    key in _SECTION_TYPES and isinstance(value, dict)):
                lifted.setdefault(section, {})[key] = value
            else:
                lifted[key] = value
        override = lifted
        override.pop("config_version", None)
    return TrainFlowConfig.from_dict(_deep_merge(base.to_dict(), override))


def _flatten(d: dict, prefix: str = "") -> dict:
    out: dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def diff_configs(config1: TrainFlowConfig, config2: TrainFlowConfig) -> dict:
    """Compare two configs: {'changed': {...}, 'added': [...], 'removed': [...]}."""
    flat1, flat2 = _flatten(config1.to_dict()), _flatten(config2.to_dict())
    changed = {
        key: {"old": flat1[key], "new": flat2[key]}
        for key in flat1.keys() & flat2.keys()
        if flat1[key] != flat2[key]
    }
    return {
        "changed": changed,
        "added": sorted(flat2.keys() - flat1.keys()),
        "removed": sorted(flat1.keys() - flat2.keys()),
    }


def print_config_diff(diff: dict) -> None:
    if diff["changed"]:
        print("Changed parameters:")
        for key, change in diff["changed"].items():
            print(f"  {key}: {change['old']} -> {change['new']}")
    if diff["added"]:
        print(f"Added parameters: {', '.join(diff['added'])}")
    if diff["removed"]:
        print(f"Removed parameters: {', '.join(diff['removed'])}")
    if not (diff["changed"] or diff["added"] or diff["removed"]):
        print("No differences found.")


# ============================================================================
# Factories (reference config.py:856-955)
# ============================================================================


def create_mnist_config(**overrides) -> TrainFlowConfig:
    """Default MNIST configuration (reshape tokenization)."""
    config = TrainFlowConfig(
        base=BaseConfig(batch_size=128, n_steps=10000, base_lr=1e-4,
                        weight_decay=1e-4, seed=42),
        model=ModelConfig(noise_dimension=784, condition_dimension=128,
                          latent_dimension=256, num_blocks=8),
        dataset=MNISTConfig(),
        method=MethodConfig(use_improved_mean_flow=False),
        training=TrainingConfig(sample_every=1000, sample_seed=42,
                                sample_steps=50,
                                workdir=Path("./outputs/mnist_default")),
    )
    return merge_configs(config, overrides) if overrides else config


def create_audio_config(**overrides) -> TrainFlowConfig:
    """Default audio configuration (MDCT tokenization)."""
    config = TrainFlowConfig(
        base=BaseConfig(batch_size=128, n_steps=10000, base_lr=1e-4,
                        weight_decay=1e-4, seed=42),
        model=ModelConfig(noise_dimension=256 * 256 * 3,
                          condition_dimension=128, latent_dimension=256,
                          num_blocks=8),
        dataset=AudioConfig(),
        method=MethodConfig(use_improved_mean_flow=False),
        training=TrainingConfig(sample_every=1000, sample_seed=42,
                                sample_steps=50,
                                workdir=Path("./outputs/audio_default")),
    )
    return merge_configs(config, overrides) if overrides else config


# ============================================================================
# Legacy configs + loading (reference config.py:1030-1117)
# ============================================================================


@dataclass
class EvaluationConfig:
    """Evaluation run configuration."""

    checkpoint: Path
    config_path: Path | None = None
    output_dir: Path | None = None
    n_steps: list[int] = field(default_factory=lambda: [1, 10, 50, 250])
    num_samples: int = 1000
    batch_size: int = 128
    seed: int = 42
    metrics_csv: Path = Path("metrics.csv")
    data_dir: str | None = None
    real_split: str = "test"
    use_improved_mean_flow: bool | None = None
    noise_dimension: int | None = None
    condition_dimension: int | None = None
    latent_dimension: int | None = None
    num_blocks: int | None = None


@dataclass
class AnalysisConfig:
    """Post-hoc analysis configuration."""

    metrics_csv: Path
    workdir: Path | None = None
    output_dir: Path | None = None

    def __post_init__(self) -> None:
        if self.workdir is None:
            if self.output_dir is None:
                raise ValueError("Either workdir or output_dir must be provided")
            warnings.warn("output_dir is deprecated. Use workdir instead.",
                          DeprecationWarning, stacklevel=2)
            self.workdir = self.output_dir


def load_config_from_json(path: Path | str) -> TrainFlowConfig:
    """Load a TrainFlowConfig from a v1 or v2 JSON file."""
    with Path(path).open("r", encoding="utf-8") as f:
        return TrainFlowConfig.from_dict(json.load(f))


def save_config_to_json(config: TrainFlowConfig, path: Path | str) -> None:
    """Write a config as v2 hierarchical JSON."""
    with Path(path).open("w", encoding="utf-8") as f:
        json.dump(config.to_dict(), f, indent=2, sort_keys=True)
