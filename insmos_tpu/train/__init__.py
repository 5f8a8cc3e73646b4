from .loss import gaussian_focal_loss, mos_loss, reg_l1_loss  # noqa: F401
from .targets import assign_targets  # noqa: F401
from .metrics import confusion_matrix, iou_from_confusion  # noqa: F401
from .optim import make_optimizer  # noqa: F401
from .step import TrainState, make_bn_reestimate, make_eval_step, make_train_step  # noqa: F401
