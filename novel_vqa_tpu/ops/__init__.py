from novel_vqa_tpu.ops.dropout import dropout
from novel_vqa_tpu.ops.lstm import (
    lstm_layer_init,
    lstm_step,
    lstm_stack_step,
    lstm_encode,
    pack_state,
    unpack_state,
)
from novel_vqa_tpu.ops.fusion import axb_init, axb_apply, askipb_apply, a_b_apply
from novel_vqa_tpu.ops.losses import cross_entropy, sequence_nll
from novel_vqa_tpu.ops.l2norm import l2_normalize
from novel_vqa_tpu.ops.embedding import embedding_lookup
