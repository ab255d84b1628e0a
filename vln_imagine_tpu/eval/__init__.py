from vln_imagine_tpu.eval.metrics import (
    eval_item,
    eval_batch,
    summarize,
    cal_dtw,
    cal_cls,
)
