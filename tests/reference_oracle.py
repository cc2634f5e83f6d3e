"""Import the read-only upstream reference as a pure-Python test oracle.

The reference (/root/reference) relies on numba, which is not installed here.
Since every @njit function and jitclass is plain Python underneath, we install
a no-op numba stub and import the reference modules unchanged — no reference
code is copied into this repo; it is executed in place purely to generate
golden behavior for parity tests.

Variant patching: the reference encodes variants as module constants
(NB_GODS, INIT_METHOD — see SURVEY.md §2.4).  We patch those module globals
after import and regenerate the derived permutation tables.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


class _NumbaTypeStub:
    def __getitem__(self, item):
        return self

    def __call__(self, *a, **k):
        return self


def _njit(*args, **kwargs):
    if args and callable(args[0]):
        return args[0]

    def deco(fn):
        return fn

    return deco


def install_numba_stub():
    if "numba" in sys.modules and getattr(sys.modules["numba"], "_is_stub", False):
        return
    numba = types.ModuleType("numba")
    numba._is_stub = True
    numba.njit = _njit
    numba.jit = _njit

    def _getattr(name):  # int8, float32, bool_, ... type expressions
        if name.startswith("__"):
            # introspection (inspect/torch custom_ops iterate sys.modules
            # and probe __file__ etc.) must see a normal missing attribute
            raise AttributeError(name)
        return _NumbaTypeStub()

    numba.__getattr__ = _getattr

    experimental = types.ModuleType("numba.experimental")

    def jitclass(spec=None):
        if isinstance(spec, type):
            return spec

        def deco(cls):
            return cls

        return deco

    experimental.jitclass = jitclass
    numba.experimental = experimental
    sys.modules["numba"] = numba
    sys.modules["numba.experimental"] = experimental


def install_colorama_stub():
    if "colorama" in sys.modules:
        return

    class _Style:
        def __getattr__(self, name):
            return ""

    col = types.ModuleType("colorama")
    col.Style = _Style()
    col.Fore = _Style()
    col.Back = _Style()
    col.init = lambda *a, **k: None
    sys.modules["colorama"] = col


def import_reference_splendor(num_players: int = 2):
    """Import the reference Splendor logic (pure Python via stubs)."""
    install_numba_stub()
    install_colorama_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for mod in list(sys.modules):
        if mod.startswith("splendor"):
            del sys.modules[mod]
    import splendor.SplendorLogicNumba as L

    # numba silently wraps uint8 -> int8 on assignment; pure numpy raises
    # OverflowError, so emulate the wrap in the stubbed module
    _orig_packbits = L.my_packbits

    def _packbits_wrap(array):
        v = int(_orig_packbits(array)) & 0xFF
        return np.int8(v - 256 if v > 127 else v)

    L.my_packbits = _packbits_wrap
    return L


def import_reference_santorini(nb_gods: int = 1, init_method: int = 0):
    """Import the reference Santorini logic with patched variant constants.

    Returns the (patched) SantoriniLogicNumba module.
    """
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    # force fresh import so repeated patching is deterministic
    for mod in list(sys.modules):
        if mod.startswith("santorini"):
            del sys.modules[mod]
    import santorini.SantoriniConstants as C
    import santorini.SantoriniLogicNumba as L

    C.NB_GODS = nb_gods
    L.NB_GODS = nb_gods
    L.INIT_METHOD = init_method
    # regenerate permutation tables for the patched action space
    C.rotation = np.array(C._generate_permutation(C.rotation_core), dtype=np.int16)
    C.flipLR = np.array(C._generate_permutation(C.flipLR_core), dtype=np.int16)
    C.flipUD = np.array(C._generate_permutation(C.flipUD_core), dtype=np.int16)
    L.rotation, L.flipLR, L.flipUD = C.rotation, C.flipLR, C.flipUD
    C.rotation_gods = np.array(C._generate_permutation_god(C.rotation_core), dtype=np.int16)
    C.flipLR_gods = np.array(C._generate_permutation_god(C.flipLR_core), dtype=np.int16)
    C.flipUD_gods = np.array(C._generate_permutation_god(C.flipUD_core), dtype=np.int16)
    L.rotation_gods, L.flipLR_gods, L.flipUD_gods = (
        C.rotation_gods, C.flipLR_gods, C.flipUD_gods)
    return L


def import_reference_abalone(initial_layout: int = 1):
    """Import the reference Abalone logic with a patched INITIAL_LAYOUT
    (0 Classic / 1 Belgian Daisy / 2 German Daisy — the committed
    pretrained_BelgianDaisy.pt was trained at the default layout 1,
    /root/reference/abalone/AbaloneLogicNumba.py:5)."""
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for mod in list(sys.modules):
        if mod.startswith("abalone"):
            del sys.modules[mod]
    import abalone.AbaloneLogicNumba as L

    L.INITIAL_LAYOUT = initial_layout
    return L


def import_reference_azul():
    """Import the reference Azul logic (2-player default, AzulGame.py:9).
    The committed pretrained.pt pickles only torch-native module classes,
    so no torchvision shims are needed for it."""
    install_numba_stub()
    install_colorama_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for mod in list(sys.modules):
        if mod.startswith("azul"):
            del sys.modules[mod]
    import azul.AzulLogicNumba as L

    # numba promotes 30*(p+1) with p int8; pure numpy overflows — widen
    # the symmetry table for the stubbed oracle (same fix as the parity
    # suite, tests/test_azul_parity.py)
    L.np_factory_symmetries = L.np_factory_symmetries.astype(np.int64)
    return L


def import_reference_minivilles():
    """Import the reference Minivilles logic (2-player default,
    MinivillesGame.py:9).  Its pretrained pickles reference only classes
    from minivilles.MinivillesNNet itself (no torchvision)."""
    install_numba_stub()
    install_colorama_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for mod in list(sys.modules):
        if mod.startswith("minivilles"):
            del sys.modules[mod]
    import minivilles.MinivillesLogicNumba as L
    return L


def make_oracle_board(L, nb_gods: int = 1):
    """Construct a reference Board in the deterministic variant.

    The reference's INIT_METHOD=0 never sets the NO_GOD power flag its own
    dispatch requires (SantoriniLogicNumba.py:103-106 vs :135), so we set it —
    mirroring alphazero_tpu.games.santorini.make_santorini's init.
    """
    b = L.Board(2)
    b.gods_power.flat[0 + nb_gods * 0] = 64
    b.gods_power.flat[0 + nb_gods * 1] = 64
    return b


def install_ort_stub():
    """onnxruntime is not installed in this image; the reference imports it
    at module scope (GenericNNetWrapper.py:20) but only uses it in its ONNX
    inference mode, which callers here bypass (device['inference']='cpu')."""
    if "onnxruntime" in sys.modules:
        return
    ort = types.ModuleType("onnxruntime")
    ort.__version__ = "0.0.0-stub"

    def _unavailable(*a, **k):
        raise RuntimeError("onnxruntime stub: ONNX inference disabled")

    ort.InferenceSession = _unavailable
    ort.SessionOptions = _unavailable
    ort.ExecutionMode = types.SimpleNamespace(ORT_SEQUENTIAL=0)
    sys.modules["onnxruntime"] = ort
    onnx = types.ModuleType("onnx")
    onnx.load = _unavailable
    onnx.checker = types.SimpleNamespace(check_model=_unavailable)
    onnx.version_converter = types.SimpleNamespace(
        convert_version=_unavailable)
    sys.modules["onnx"] = onnx
    # torchvision: imported at SantoriniNNet module scope for the MobileNet
    # versions; the committed pretrained nets (V89) use plain torch blocks
    if "torchvision" not in sys.modules:
        import torch.nn as _nn

        class InvertedResidual(_nn.Module):
            """Functional re-implementation of torchvision's MobileNetV3
            block for UNPICKLING the reference's committed .pt models
            (e.g. abalone/pretrained_*.pt pickle the full_model, whose
            GLOBALs name this class): instance state (``block``,
            ``use_res_connect``) is restored from the pickle; only the
            forward semantics are needed here."""

            def forward(self, x):
                result = self.block(x)
                if self.use_res_connect:
                    result = result + x
                return result

        class Conv2dNormActivation(_nn.Sequential):
            """torchvision.ops.misc.Conv2dNormActivation is an
            nn.Sequential subclass; Sequential.forward is the behavior."""

        class SqueezeExcitation(_nn.Module):
            """torchvision.ops.misc.SqueezeExcitation forward semantics;
            submodules (avgpool/fc1/fc2/activation/scale_activation) are
            restored from the pickle."""

            def forward(self, x):
                scale = self.avgpool(x)
                scale = self.fc1(scale)
                scale = self.activation(scale)
                scale = self.fc2(scale)
                return self.scale_activation(scale) * x

        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        mnv3 = types.ModuleType("torchvision.models.mobilenetv3")
        mnv3.InvertedResidualConfig = _unavailable
        mnv3.InvertedResidual = InvertedResidual
        ops = types.ModuleType("torchvision.ops")
        ops_misc = types.ModuleType("torchvision.ops.misc")
        ops_misc.Conv2dNormActivation = Conv2dNormActivation
        ops_misc.SqueezeExcitation = SqueezeExcitation
        ops.misc = ops_misc
        tv.ops = ops
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.misc"] = ops_misc
        utils = types.ModuleType("torchvision.models._utils")

        def _make_divisible(v, divisor, min_value=None):
            # torchvision.models._utils._make_divisible (SplendorNNet.py:4);
            # standard MobileNet channel rounding, re-implemented for the stub
            if min_value is None:
                min_value = divisor
            new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
            if new_v < 0.9 * v:
                new_v += divisor
            return new_v

        utils._make_divisible = _make_divisible
        tv.models = models
        models.mobilenetv3 = mnv3
        models._utils = utils
        # mark torchvision.models as a package so `from torchvision.models
        # ._utils import ...` resolves through the submodule registry
        models.__path__ = []
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.models.mobilenetv3"] = mnv3
        sys.modules["torchvision.models._utils"] = utils
