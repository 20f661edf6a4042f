"""Runner-layer tests: step loop, chunked scan, trajectory, checkpoint, energy."""

import json
import os

import jax
import numpy as np
import pytest

from wgpu_n_body_tpu.inits import spherical_init, uniform_init
from wgpu_n_body_tpu.models.naive import NaiveSim
from wgpu_n_body_tpu.ops.energy import kinetic_energy, potential_energy, total_energy
from wgpu_n_body_tpu.params import NaiveParams, SimParams
from wgpu_n_body_tpu.runners.headless import OfflineHeadless
from wgpu_n_body_tpu.runners.trajectory import TrajectoryReader, TrajectoryWriter
from wgpu_n_body_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

PARAMS = SimParams(particle_num=96, g=1e-4)
NP_ = NaiveParams(use_pallas=False)


def _runner():
    return OfflineHeadless(NaiveSim(PARAMS, NP_), uniform_init, key=0)


def test_stepwise_and_chunked_agree():
    r1 = _runner()
    r2 = _runner()
    for _ in range(6):
        r1.step()
    r2.run(steps=6, chunk=3)
    np.testing.assert_allclose(
        np.asarray(r1.state.pos), np.asarray(r2.state.pos), rtol=1e-6, atol=1e-7
    )
    assert r1.step_num == r2.step_num == 6


def test_timer_records_steps():
    r = _runner()
    t = r.step()
    assert t > 0 and len(r.timer.times_s) == 1


def test_trajectory_roundtrip(tmp_path):
    root = str(tmp_path / "traj")
    r = _runner()
    w = TrajectoryWriter(root, meta={"n": PARAMS.particle_num})
    r.run(steps=4, chunk=2, trajectory=w, trajectory_every=2)
    reader = TrajectoryReader(root)
    assert reader.steps == [0, 2, 4]
    last = reader.positions(2)
    np.testing.assert_array_equal(last, np.asarray(r.state.pos))
    assert reader.meta["n"] == PARAMS.particle_num


def test_checkpoint_resume_equivalence(tmp_path):
    ck = str(tmp_path / "state.npz")
    r1 = _runner()
    r1.run(steps=3)
    save_checkpoint(ck, r1.state, PARAMS, r1.step_num)
    r1.run(steps=3)

    ckpt = load_checkpoint(ck)
    state, params, step = ckpt.state, ckpt.params, ckpt.step
    assert step == 3 and params == PARAMS
    r2 = OfflineHeadless(NaiveSim(params, NP_), uniform_init, key=0)
    r2.state, r2.step_num = state, step
    r2.run(steps=3)
    np.testing.assert_allclose(
        np.asarray(r1.state.pos), np.asarray(r2.state.pos), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(r1.state.vel), np.asarray(r2.state.vel), rtol=1e-5, atol=1e-7
    )


def test_energy_matches_numpy():
    st = uniform_init(jax.random.key(3), PARAMS)
    pos = np.asarray(st.pos, np.float64)
    vel = np.asarray(st.vel, np.float64)
    mass = np.asarray(st.mass, np.float64)
    ke_np = 0.5 * np.sum(mass * np.sum(vel**2, axis=1))
    pe_np = 0.0
    n = len(pos)
    for i in range(n):
        for j in range(i + 1, n):
            pe_np -= PARAMS.g * mass[i] * mass[j] / np.linalg.norm(pos[i] - pos[j])
    np.testing.assert_allclose(float(kinetic_energy(st)), ke_np, rtol=1e-5)
    np.testing.assert_allclose(
        float(potential_energy(st, PARAMS, block=32)), pe_np, rtol=1e-4
    )
    np.testing.assert_allclose(
        float(total_energy(st, PARAMS, block=32)), ke_np + pe_np, rtol=1e-4
    )


def test_energy_drift_small_over_short_run():
    # Leapfrog is symplectic: relative drift over 50 gentle steps stays tiny.
    params = SimParams(particle_num=128, g=1e-6, dt=0.004)
    r = OfflineHeadless(NaiveSim(params, NP_), uniform_init, key=1)
    e0 = float(total_energy(r.state, params))
    r.run(steps=50, chunk=10)
    e1 = float(total_energy(r.state, params))
    assert abs(e1 - e0) / abs(e0) < 1e-3


def test_energy_drift_long_horizon_proxy():
    # CI-scale proxy of BASELINE config 5 (100k-step drift run): N=512
    # spherical, 10k leapfrog steps in scan chunks. The reference
    # integrator is not strictly symplectic (dt folded into acc +
    # post-drift receiver positions), so drift is nonzero but must stay
    # bounded: measured 7.5e-3 at this config (2026-08-16); assert 4x.
    params = SimParams(particle_num=512, g=1e-6, e=1e-4, dt=0.016)
    r = OfflineHeadless(NaiveSim(params, NP_), spherical_init, key=2)
    e0 = float(total_energy(r.state, params))
    r.run(steps=10_000, chunk=1000)
    e1 = float(total_energy(r.state, params))
    assert abs(e1 - e0) / abs(e0) < 0.03


def test_chunk_cadence_validation():
    r = _runner()
    with pytest.raises(ValueError):
        r.run(steps=4, chunk=4, energy_every=3)
