from .loss import smooth_label_cross_entropy, caption_loss
from .trainer import TrainState, make_train_step, init_train_state, default_optimizer
from .finetune import TSVCaptionDataset, batch_iterator, run_finetune
