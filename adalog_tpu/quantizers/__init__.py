from adalog_tpu.quantizers.ste import round_ste, floor_ste, ceil_ste
from adalog_tpu.quantizers.state import QuantizerState, GELU_MIN
from adalog_tpu.quantizers.uniform import (
    uniform_quant,
    twin_uniform_quant,
)
from adalog_tpu.quantizers.logarithm import (
    log2_quant,
    logsqrt2_quant,
    adalog_quant,
    make_adalog_tables,
    make_mantissa_table,
)
from adalog_tpu.quantizers.adaround import (
    adaround_init_alpha,
    adaround_soft_targets,
    adaround_quant,
    adaround_hard_weight,
)
from adalog_tpu.quantizers.apply import apply_quantizer, apply_weight_quantizer
