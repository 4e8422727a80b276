"""Device-resident trace generation (graph/device_trace.py): the device
PIE must be BIT-EXACT vs the host interpreter (trace.py), settings ranges
must match, and proofs from device PIEs must serialize to identical wire
bytes and pass both verifiers.  (VERDICT r2 item 3.)"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from luminair_tpu import native, serde
from luminair_tpu.graph import device_trace
from luminair_tpu.parallel import accel
from luminair_tpu.pcs.config import FriConfig, PcsConfig
from luminair_tpu.prelude import (
    Graph,
    gen_circuit_settings,
    gen_trace,
    prove,
    verify,
)

CFG = PcsConfig(
    pow_bits=1,
    fri=FriConfig(log_blowup_factor=1, log_last_layer_degree_bound=0, n_queries=6),
)

RNG = np.random.default_rng(77)


def _data(shape, lo=0.2, hi=1.2):
    return RNG.uniform(lo, hi, shape)


def build_all_ops(cx, d):
    a = cx.tensor((3, 4)).set(d["a"])
    b = cx.tensor((3, 4)).set(d["b"])
    (
        (a * b + a).sin()
        + b.sqrt().exp2()
        + a.log2().recip()
        + (a < b)
        + (a % b)
    ).sum_reduce(1).max_reduce(0).retrieve()


def build_mlp(cx, d):
    x = cx.tensor((4, 2)).set(d["x"])
    w1 = cx.tensor((2, 8)).set(d["w1"])
    w2 = cx.tensor((8, 1)).set(d["w2"])
    ((x @ w1).tanh() @ w2).retrieve()


def build_broadcast(cx, d):
    a = cx.tensor((3, 1)).set(d["a31"])
    b = cx.tensor((3, 4)).set(d["b"])
    (a.expand(1, 4) * b + a.expand(1, 4)).sum_reduce(0).retrieve()
    b.square().retrieve()


def build_slices(cx, d):
    a = cx.tensor((4, 4)).set(d["a44"])
    (a.slice_dim(1, 0, 2).contiguous() * 2.0).retrieve()
    t = cx.tensor((4, 1)).set(d["a41"])
    (t.expand(1, 4).contiguous() + 0.5).retrieve()


def build_reduce_axes(cx, d):
    a = cx.tensor((2, 3, 5)).set(d["neg"])
    a.sum_reduce(0).retrieve()
    b = cx.tensor((2, 3, 5)).set(d["neg"])
    b.max_reduce(1).retrieve()
    c = cx.tensor((2, 3, 5)).set(d["neg"])
    c.sum_reduce(2).retrieve()


def build_negative(cx, d):
    a = cx.tensor((4, 4)).set(d["sn"])
    b = cx.tensor((4, 4)).set(d["sn2"])
    ((a * b) + (a < b) + (a % b)).retrieve()
    a.sqrt().retrieve()  # negative inputs clamp to 0 inside sqrt


DATA = {
    "a": _data((3, 4)),
    "b": _data((3, 4)),
    "x": _data((4, 2), -1.0, 1.0),
    "w1": _data((2, 8), -0.7, 0.7),
    "w2": _data((8, 1), -0.7, 0.7),
    "a31": _data((3, 1)),
    "a44": _data((4, 4)),
    "a41": _data((4, 1)),
    "neg": _data((2, 3, 5), -2.0, 2.0),
    "sn": _data((4, 4), -3.0, 3.0),
    "sn2": _data((4, 4), -2.0, 2.0),
}

BUILDERS = {
    "all_ops": build_all_ops,
    "mlp": build_mlp,
    "broadcast": build_broadcast,
    "slices": build_slices,
    "reduce_axes": build_reduce_axes,
    "negative": build_negative,
}


def _host_and_device(build):
    cxs, pies, settings_pair = [], [], []
    for device in (False, True):
        cx = Graph()
        build(cx, DATA)
        cx.compile()
        settings = gen_circuit_settings(cx, device=device)
        pie = gen_trace(cx, settings, device=device)
        cxs.append(cx)
        pies.append(pie)
        settings_pair.append(settings)
    return cxs, pies, settings_pair


@pytest.mark.parametrize("name", list(BUILDERS))
def test_device_pie_bit_exact(name):
    cxs, (host_pie, dev_pie), (host_s, dev_s) = _host_and_device(BUILDERS[name])

    # Settings parity (LUT ranges discovered on device == host).
    assert host_s.to_dict() == dev_s.to_dict()

    # PIE parity: same tables, same columns, identical uint32 values.
    assert set(host_pie.trace_tables) == set(dev_pie.trace_tables)
    for tname, ht in host_pie.trace_tables.items():
        dt = dev_pie.trace_tables[tname]
        assert set(ht.columns) == set(dt.columns), tname
        for cname, hcol in ht.columns.items():
            dcol = np.asarray(dt.columns[cname])
            assert dcol.dtype == np.uint32, (tname, cname)
            assert np.array_equal(np.asarray(hcol), dcol), (tname, cname)
    assert (
        host_pie.metadata.execution_resources.op_counter
        == dev_pie.metadata.execution_resources.op_counter
    )

    # Retrieved outputs identical.
    for rid, hv in cxs[0].output_data.items():
        np.testing.assert_array_equal(hv, cxs[1].output_data[rid])


def test_device_pie_proves_identically():
    """A proof from the device PIE must byte-equal the host-PIE proof and
    pass the Python + native verifiers."""
    _, (host_pie, dev_pie), (settings, _) = _host_and_device(build_all_ops)
    p_host = prove(host_pie, settings, CFG)
    p_dev = prove(dev_pie, settings, CFG)
    assert serde.proof_to_flat_bytes(p_host) == serde.proof_to_flat_bytes(p_dev)
    assert verify(p_dev, settings)
    assert native.verify(p_dev, settings)


def test_device_pie_feeds_accel_prover(monkeypatch):
    """Device PIE -> accel (jitted) prover end-to-end, still bit-exact."""
    monkeypatch.setattr(accel, "OFFLOAD_MIN_ROWS", 1)
    accel.enable(True)
    try:
        _, (host_pie, dev_pie), (settings, _) = _host_and_device(build_mlp)
        p_dev = prove(dev_pie, settings, CFG)
    finally:
        accel.enable(False)
    p_host = prove(host_pie, settings, CFG)
    assert serde.proof_to_flat_bytes(p_host) == serde.proof_to_flat_bytes(p_dev)
    assert verify(p_dev, settings)


def test_lut_out_of_range_raises():
    """Tampered settings (too-narrow LUT) must raise, mirroring the host
    interpreter's error path."""
    cx = Graph()
    build_all_ops(cx, DATA)
    cx.compile()
    settings = gen_circuit_settings(cx, device=True)
    settings.lookups.sin.ranges[-1].hi -= 2000
    from luminair_tpu.errors import LuminairError

    with pytest.raises(LuminairError):
        gen_trace(cx, settings, device=True)


def test_estimated_rows_matches_actual():
    cx = Graph()
    build_all_ops(cx, DATA)
    cx.compile()
    est = device_trace.estimated_rows(cx)
    settings = gen_circuit_settings(cx, device=False)
    pie = gen_trace(cx, settings, device=False)
    actual = sum(
        t.n_rows
        for name, t in pie.trace_tables.items()
        if not name.endswith("_lookup")
    )
    assert est == actual
