from sesameai_tts_tpu.ops.sampling import sample_topk
from sesameai_tts_tpu.ops.attention import flash_attention
from sesameai_tts_tpu.ops.quant import qdot, quantize_csm, quantize_weight
