from novel_vqa_tpu.data.align import right_align
from novel_vqa_tpu.data.vqa import VQAData
from novel_vqa_tpu.data.corpus import CorpusLoader
