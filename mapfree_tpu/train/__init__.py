from mapfree_tpu.train.state import (
    TrainState,
    init_state,
    make_optimizer,
    make_predict_step,
    make_train_step,
    make_val_step,
)
from mapfree_tpu.train.loop import (
    CheckpointManager,
    ScalarLogger,
    aggregate_validation,
    check_finite_or_die,
    run_validation,
)
