"""ONNX reader/writer + vendor weight binding (VERDICT item 4).

The reference ingests TEN VAD and ZipEnhancer-ONNX through onnxruntime
(reference: whisperjav/modules/speech_segmentation/backends/ten.py,
whisperjav/modules/speech_enhancement/backends/zipenhancer.py:208-258).
These tests synthesize files in the exact vendor wire layouts — torch
export naming (state-dict names as initializer names) and native ONNX
``LSTM``/``Conv``/``Gemm`` ops with the spec's ``iofc`` gate order — and
prove the converters bind them to numerically identical pytrees.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.utils import onnx_io
from whisperjav_tpu.utils.onnx_io import OnnxGraph, OnnxNode


# ---------------------------------------------------------------- codec
def test_tensor_roundtrip_dtypes(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "f32": rng.standard_normal((3, 4)).astype(np.float32),
        "f16": rng.standard_normal((2, 2, 2)).astype(np.float16),
        "f64": rng.standard_normal((5,)).astype(np.float64),
        "i64": np.array([-3, 0, 7, 2 ** 40], np.int64),
        "i32": np.array([[1, -2], [3, 4]], np.int32),
        "i8": np.arange(-4, 4, dtype=np.int8),
        "u8": np.arange(8, dtype=np.uint8).reshape(2, 4),
        "bool": np.array([True, False, True]),
        "scalar": np.float32(2.5),
    }
    g = OnnxGraph(name="t", initializers={k: np.asarray(v)
                                          for k, v in tensors.items()})
    path = tmp_path / "t.onnx"
    onnx_io.write_onnx(str(path), g)
    model = onnx_io.read_onnx(str(path))
    assert model.ir_version == 8 and model.opset == 17
    assert model.graph.name == "t"
    for k, v in tensors.items():
        got = model.graph.initializers[k]
        assert got.dtype == np.asarray(v).dtype, k
        assert got.shape == np.asarray(v).shape, k
        np.testing.assert_array_equal(got, np.asarray(v), err_msg=k)


def test_node_and_attr_roundtrip(tmp_path):
    node = OnnxNode(
        op_type="LSTM", name="lstm0",
        inputs=["x", "W", "R", "B"], outputs=["y", "yh", "yc"],
        attrs={"hidden_size": 64, "alpha": 0.5, "direction": "forward",
               "kernel_shape": [3, 3], "scales": [1.0, 2.0],
               "blob": np.arange(6, dtype=np.float32).reshape(2, 3)})
    g = OnnxGraph(nodes=[node], inputs=["x"], outputs=["y"])
    path = tmp_path / "n.onnx"
    onnx_io.write_onnx(str(path), g)
    got = onnx_io.read_onnx(str(path)).graph
    assert got.inputs == ["x"] and got.outputs == ["y"]
    n = got.nodes[0]
    assert n.op_type == "LSTM" and n.name == "lstm0"
    assert n.inputs == ["x", "W", "R", "B"]
    assert n.outputs == ["y", "yh", "yc"]
    assert n.attrs["hidden_size"] == 64
    assert n.attrs["alpha"] == pytest.approx(0.5)
    assert n.attrs["direction"] == "forward"
    assert n.attrs["kernel_shape"] == [3, 3]
    assert n.attrs["scales"] == [1.0, 2.0]
    np.testing.assert_array_equal(
        n.attrs["blob"], np.arange(6, dtype=np.float32).reshape(2, 3))


def test_typed_field_decoding():
    """Exporters that use float_data/int32_data instead of raw_data."""
    import struct

    def lf(fno, payload):
        return onnx_io._tag(fno, 2) + onnx_io._varint(len(payload)) \
            + payload

    # float_data (packed field 4), name, dims
    t = (onnx_io._tag(1, 0) + onnx_io._varint(2)
         + onnx_io._tag(2, 0) + onnx_io._varint(1)
         + lf(4, struct.pack("<2f", 1.5, -2.0))
         + lf(8, b"fd"))
    name, arr = onnx_io._decode_tensor(t)
    assert name == "fd"
    np.testing.assert_allclose(arr, [1.5, -2.0])

    # int32_data carrying float16 payload (spec quirk)
    h = np.array([0.5, -1.25], np.float16).view(np.uint16)
    body = b"".join(onnx_io._varint(int(v)) for v in h)
    t = (onnx_io._tag(1, 0) + onnx_io._varint(2)
         + onnx_io._tag(2, 0) + onnx_io._varint(10)
         + lf(5, body) + lf(8, b"hf"))
    name, arr = onnx_io._decode_tensor(t)
    assert arr.dtype == np.float16
    np.testing.assert_allclose(arr.astype(np.float32), [0.5, -1.25])


def test_topo_order_sorts_shuffled_nodes():
    nodes = [
        OnnxNode(op_type="Add", inputs=["b", "c"], outputs=["d"]),
        OnnxNode(op_type="Relu", inputs=["a"], outputs=["b"]),
        OnnxNode(op_type="Mul", inputs=["a", "w"], outputs=["c"]),
    ]
    g = OnnxGraph(nodes=nodes, inputs=["a"],
                  initializers={"w": np.zeros(1, np.float32)})
    order = [n.op_type for n in onnx_io.topo_order(g)]
    assert order.index("Add") > order.index("Relu")
    assert order.index("Add") > order.index("Mul")


# ------------------------------------------------------------- TEN bind
def _ten_params():
    from whisperjav_tpu.models.vad import ten

    return ten.init_params(jax.random.PRNGKey(3))


def test_ten_torch_export_binding(tmp_path):
    """torch.onnx.export layout: state-dict names as initializers."""
    from whisperjav_tpu.models.vad import ten

    params = _ten_params()
    names = {
        "conv1.weight": "conv1_w", "conv1.bias": "conv1_b",
        "conv2.weight": "conv2_w", "conv2.bias": "conv2_b",
        "lstm.weight_ih_l0": "lstm_wi", "lstm.weight_hh_l0": "lstm_wh",
        "lstm.bias_ih_l0": "lstm_bi", "lstm.bias_hh_l0": "lstm_bh",
        "out.weight": "out_w", "out.bias": "out_b",
    }
    g = OnnxGraph(initializers={
        onnx: np.asarray(params[ours]) for onnx, ours in names.items()})
    path = tmp_path / "ten_torch.onnx"
    onnx_io.write_onnx(str(path), g)

    loaded = ten.params_from_onnx(str(path))
    for k in params:
        np.testing.assert_allclose(np.asarray(loaded[k]),
                                   np.asarray(params[k]), err_msg=k)


def test_ten_native_lstm_structural_binding(tmp_path):
    """Native ONNX ops: LSTM W/R/B in iofc order, Convs, Gemm head.

    Probabilities after binding must be identical to the source params —
    proving the iofc→ifgo gate reorder and Wb/Rb bias split are right.
    """
    from whisperjav_tpu.models.vad import ten

    params = _ten_params()
    h = ten.HIDDEN

    def to_iofc(w):
        w = np.asarray(w)
        i, f, gg, o = [w[j * h:(j + 1) * h] for j in range(4)]
        return np.concatenate([i, o, f, gg], axis=0)   # torch→onnx

    init = {
        "c1w": np.asarray(params["conv1_w"]),
        "c1b": np.asarray(params["conv1_b"]),
        "c2w": np.asarray(params["conv2_w"]),
        "c2b": np.asarray(params["conv2_b"]),
        "W": to_iofc(params["lstm_wi"])[None],          # (1, 4H, I)
        "R": to_iofc(params["lstm_wh"])[None],
        "B": np.concatenate([to_iofc(params["lstm_bi"]),
                             to_iofc(params["lstm_bh"])])[None],
        "ow": np.asarray(params["out_w"]),              # (1, H)
        "ob": np.asarray(params["out_b"]),
    }
    nodes = [
        OnnxNode(op_type="Conv", inputs=["feat", "c1w", "c1b"],
                 outputs=["h1"], attrs={"kernel_shape": [3], "pads": [1, 1]}),
        OnnxNode(op_type="Relu", inputs=["h1"], outputs=["h1r"]),
        OnnxNode(op_type="Conv", inputs=["h1r", "c2w", "c2b"],
                 outputs=["h2"], attrs={"kernel_shape": [3], "pads": [1, 1]}),
        OnnxNode(op_type="Relu", inputs=["h2"], outputs=["h2r"]),
        OnnxNode(op_type="LSTM", inputs=["h2r", "W", "R", "B"],
                 outputs=["hs", "hn", "cn"], attrs={"hidden_size": h}),
        OnnxNode(op_type="Gemm", inputs=["hs", "ow", "ob"],
                 outputs=["logit"], attrs={"transB": 1}),
        OnnxNode(op_type="Sigmoid", inputs=["logit"], outputs=["prob"]),
    ]
    g = OnnxGraph(nodes=nodes, initializers=init, inputs=["feat"],
                  outputs=["prob"])
    path = tmp_path / "ten_native.onnx"
    onnx_io.write_onnx(str(path), g)

    loaded = ten.params_from_onnx(str(path))
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, ten.HOP * 20)).astype(np.float32) * 0.1)
    p_ref = np.asarray(ten.apply(params, audio))
    p_new = np.asarray(ten.apply(loaded, audio))
    np.testing.assert_allclose(p_new, p_ref, atol=1e-6)


def test_ten_rejects_foreign_graph(tmp_path):
    from whisperjav_tpu.models.vad import ten

    g = OnnxGraph(initializers={"foo": np.zeros((2, 2), np.float32)})
    path = tmp_path / "bad.onnx"
    onnx_io.write_onnx(str(path), g)
    with pytest.raises(ValueError):
        ten.params_from_onnx(str(path))


# ----------------------------------------------------------- Zip bind
def test_zipenhancer_onnx_and_vendor_prefix(tmp_path):
    """ONNX initializers under a ``generator.`` wrapper prefix bind to
    the same pytree as the bare torch state dict."""
    torch = pytest.importorskip("torch")
    from test_zipenhancer_parity import CFG, _TorchZip
    from whisperjav_tpu.models.enhancement import zipenhancer as zz

    torch.manual_seed(0)
    twin = _TorchZip(CFG)
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}

    ref = zz.params_from_torch_state_dict(sd, CFG)
    g = OnnxGraph(initializers={f"generator.{k}": v
                                for k, v in sd.items()})
    path = tmp_path / "zip.onnx"
    onnx_io.write_onnx(str(path), g)
    got = zz.params_from_onnx(str(path), CFG)

    flat_ref = jax.tree.leaves(ref)
    flat_got = jax.tree.leaves(got)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6)
