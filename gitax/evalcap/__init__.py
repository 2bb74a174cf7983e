from .evaluate import evaluate_on_coco_caption, score_captions
from .cider import CiderD
from .bleu import corpus_bleu
from .rouge import rouge_l
