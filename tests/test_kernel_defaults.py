"""Per-model eval-kernel auto-defaults (ops/kernel_defaults.py): the
measured table wins for measured names, the family/width heuristic covers
the rest, tiny CI fixtures never auto-enable kernels, and explicit config
values always override auto."""

from adalog_tpu.models.zoo import model_spec
from adalog_tpu.ops.kernel_defaults import kernel_defaults, \
    resolve_kernel_config
from adalog_tpu.utils.config import Config


def test_measured_table():
    assert kernel_defaults(model_spec("deit_small")) == {
        "use_pallas": False, "eval_int8": False}
    for m in ("deit_base", "vit_large", "swin_base_384"):
        assert kernel_defaults(model_spec(m)) == {
            "use_pallas": True, "eval_int8": True}


def test_heuristic_fallback():
    # unmeasured names fall through: ViTs by width, Swins on
    assert kernel_defaults(model_spec("deit_tiny"))["use_pallas"] is False
    assert kernel_defaults(model_spec("vit_small"))["use_pallas"] is False
    assert kernel_defaults(model_spec("vit_base"))["use_pallas"] is True
    assert kernel_defaults(model_spec("swin_tiny"))["use_pallas"] is True
    assert kernel_defaults(model_spec("swin_base"))["use_pallas"] is True


def test_tiny_fixtures_stay_off():
    assert kernel_defaults(model_spec("test_tiny"))["use_pallas"] is False
    assert kernel_defaults(model_spec("test_tiny_swin"))["use_pallas"] is False


def test_resolve_auto_and_override():
    spec = model_spec("swin_base_384")
    cfg = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4)
    assert cfg.use_pallas is None and cfg.eval_int8 is None
    resolve_kernel_config(cfg, spec)
    assert cfg.use_pallas is True and cfg.eval_int8 is True

    cfg2 = Config(w_bit=4, a_bit=4, s_bit=4, qhead_a_bit=4,
                  use_pallas=False, eval_int8=True)
    resolve_kernel_config(cfg2, spec)   # explicit values untouched
    assert cfg2.use_pallas is False and cfg2.eval_int8 is True
