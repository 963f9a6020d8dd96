"""Precision-ladder configuration (pauxy_tpu/config.py).

The documented speed-ladder names ('float32' / 'bfloat16_3x' / 'bfloat16')
must map onto whatever enum names the deployed jax accepts — releases
disagree (some spell the 3-pass tier 'bfloat16_3x', others 'high'), and
VERDICT r3 found the literal pass-through raising ValueError on the chip.
These tests simulate both enum vocabularies by intercepting config.update.
"""

import jax
import pytest

from pauxy_tpu import config


class _FakeConfig:
    """Records jax.config.update calls, accepting only a fixed enum set."""

    def __init__(self, accepted):
        self.accepted = accepted
        self.set = None

    def update(self, name, value):
        assert name == "jax_default_matmul_precision"
        if value not in self.accepted:
            raise ValueError(f"new enum value must be None or in "
                             f"{sorted(self.accepted)}, got {value}")
        self.set = value


# The enum vocabulary BENCH_r03 observed on the deployed TPU jax.
_DEPLOYED = {"default", "high", "highest", "bfloat16", "tensorfloat32",
             "float32"}
# A vocabulary with explicit pass-count names (older/newer jax).
_EXPLICIT = {"default", "bfloat16", "bfloat16_3x", "bfloat16_6x", "float32",
             "highest"}


@pytest.mark.unit
@pytest.mark.parametrize("accepted,policy,expect_enum", [
    (_DEPLOYED, "bfloat16_3x", "high"),
    (_DEPLOYED, "float32", "float32"),
    (_DEPLOYED, "bfloat16", "bfloat16"),
    (_EXPLICIT, "bfloat16_3x", "bfloat16_3x"),
    (_EXPLICIT, "float32", "float32"),
])
def test_ladder_aliases_to_available_enum(monkeypatch, accepted, policy,
                                          expect_enum):
    fake = _FakeConfig(accepted)
    monkeypatch.setattr(config.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(config.jax, "config", fake)
    assert config.set_matmul_precision(policy) == policy
    assert fake.set == expect_enum


@pytest.mark.unit
def test_ladder_fails_loudly_when_no_tier_exists(monkeypatch):
    fake = _FakeConfig({"default"})
    monkeypatch.setattr(config.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(config.jax, "config", fake)
    with pytest.raises(ValueError, match="bfloat16_3x"):
        config.set_matmul_precision("bfloat16_3x")


@pytest.mark.unit
def test_cpu_is_noop():
    # The suite runs on CPU: no config mutation, full-precision answer.
    prev = jax.config.jax_default_matmul_precision
    assert config.set_matmul_precision("bfloat16_3x") == "float32"
    assert jax.config.jax_default_matmul_precision == prev
