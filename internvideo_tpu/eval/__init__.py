from internvideo_tpu.eval.retrieval import (
    itm_eval,
    retrieval_evaluation,
)
