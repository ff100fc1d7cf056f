"""Golden-number harness logic: checkpoint loading round-trip + assertion
semantics (the datasets/checkpoints themselves live off-box; the harness
contract is what's testable here)."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opticalflowfromdepth_tpu.tools import golden_check as gc


def test_golden_table_matches_reference_script():
    # values transcribed from adjusted_gmflow/scripts/evaluate.sh:8-36
    assert gc.GOLDEN["gmflow"]["things_clean"] == 3.475
    assert gc.GOLDEN["gmflow"]["sintel_clean"] == 1.495
    assert gc.GOLDEN["gmflow"]["sintel_final"] == 2.955
    assert gc.GOLDEN["gmflow_refine"]["sintel_final"] == 2.475
    assert set(gc.VALIDATORS) >= set(gc.GOLDEN["gmflow"])


def test_run_check_assertion_semantics(monkeypatch):
    fake = {"things_clean": lambda f, r, p: 3.49,   # within 0.03
            "sintel_clean": lambda f, r, p: 1.60}   # off by 0.105
    monkeypatch.setattr(gc, "VALIDATORS", fake)
    res = gc.run_check("gmflow", infer_fn=None, padding_factor=16,
                       data_root="x", dataset_keys=["things_clean",
                                                    "sintel_clean"],
                       tol=0.03)
    assert res["things_clean"]["ok"]
    assert not res["sintel_clean"]["ok"]
    assert res["sintel_clean"]["abs_err"] == pytest.approx(0.105)


@pytest.mark.skipif(not gc.__doc__, reason="never")
@pytest.mark.slow
def test_ckpt_roundtrip_npz(tmp_path):
    """port CLI .npz -> load_params -> same forward as direct port."""
    torch = pytest.importorskip("torch")
    import pathlib
    if not pathlib.Path("/root/reference").exists():
        pytest.skip("reference tree not on disk")
    sys.path.insert(0, "/root/reference/adjusted_gmflow")
    try:
        from gmflow.gmflow import GMFlow as TorchGMFlow
    finally:
        sys.path.pop(0)
    torch.manual_seed(0)
    tm = TorchGMFlow(num_scales=1)
    pth = tmp_path / "m.pth"
    torch.save(tm.state_dict(), str(pth))
    npz = tmp_path / "m.npz"
    subprocess.run(
        [sys.executable, "-m",
         "opticalflowfromdepth_tpu.tools.port_torch_weights",
         "--model", "gmflow", "--ckpt", str(pth), "--out", str(npz)],
        check=True, cwd="/root/repo")

    params = gc.load_params(str(npz), num_scales=1)
    infer_fn, pf = gc.make_infer_fn("gmflow", params)
    assert pf == 16
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32)
    out = np.asarray(infer_fn(im, im))
    assert out.shape == (1, 64, 96, 2)
    assert np.isfinite(out).all()
    # identical params as a direct in-process port
    from opticalflowfromdepth_tpu.tools import port_torch_weights as port
    direct = port.to_variables(port.port_gmflow(tm.state_dict(),
                                                num_scales=1))["params"]
    import flax.traverse_util as tu
    a = tu.flatten_dict(params)
    b = tu.flatten_dict(direct)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
