from novel_vqa_tpu.eval.vqa_api import VQA
from novel_vqa_tpu.eval.vqa_eval import VQAEval
