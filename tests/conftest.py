"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so the sharded
(`shard_map`) paths can be exercised without TPU hardware, mirroring the
driver's multi-chip dry-run. Must set env before the first jax import.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup (before this
# file runs), so the env vars above may be read too late; force the CPU
# platform at runtime as well.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: this host pays ~0.5s per tiny XLA program;
# caching makes repeated test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import json  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
REF_FRAMES = "/root/reference/frames"


class FixtureCase:
    """One golden case generated from the compiled reference binary."""

    def __init__(self, name: str):
        self.name = name
        self.dir = os.path.join(FIXTURES, name)
        with open(os.path.join(self.dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.blk_dim = self.meta["blk_dim"]
        self.span = self.meta["span"]
        self.width = self.meta["width"]
        self.height = self.meta["height"]
        self.metric = self.meta["metric"]

    def _frame(self, key):
        name = self.meta[key]
        path = os.path.join(self.dir, name)
        if not os.path.exists(path):
            path = os.path.join(REF_FRAMES, name)
        data = np.fromfile(path, dtype=np.uint8, count=self.height * self.width)
        return data.reshape(self.height, self.width)

    @property
    def cur(self):
        return self._frame("cur")

    @property
    def ref(self):
        return self._frame("ref")

    @property
    def golden_stack(self):
        """The reference binary's 5-frame stacked output, [5, H, W] uint8."""
        path = os.path.join(self.dir, "output.yuv")
        data = np.fromfile(path, dtype=np.uint8)
        return data.reshape(5, self.height, self.width)

    @property
    def stdout(self) -> str:
        with open(os.path.join(self.dir, "stdout.txt")) as f:
            return f.read()

    def golden_psnr(self):
        """The %.6f PSNR printed by the MSE driver (main.c:171)."""
        for line in self.stdout.splitlines():
            if line.startswith("PSNR: ") and "." in line:
                return float(line.split()[1])
        raise AssertionError(f"no PSNR line in {self.name}")

    def golden_scores(self):
        """(original, compensated) residual MSE from the SSIM driver
        (main_ssim.c:96)."""
        for line in self.stdout.splitlines():
            if line.startswith("Original Score:"):
                parts = line.replace(",", "").split()
                return float(parts[2]), float(parts[5])
        raise AssertionError(f"no score line in {self.name}")


def foreman(name: str) -> np.ndarray:
    """Load a bundled Foreman CIF luma plane (352x288) by base name."""
    path = os.path.join(REF_FRAMES, f"{name}.yuv")
    data = np.fromfile(path, dtype=np.uint8, count=288 * 352)
    return data.reshape(288, 352)


def all_cases():
    return sorted(
        d for d in os.listdir(FIXTURES)
        if os.path.isdir(os.path.join(FIXTURES, d))
    )


def mse_cases():
    return [c for c in all_cases() if "_mse_" in c]


def ssim_cases():
    return [c for c in all_cases() if "_ssim_" in c]


@pytest.fixture
def fixture_case(request):
    return FixtureCase(request.param)
