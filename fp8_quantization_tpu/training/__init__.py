from fp8_quantization_tpu.training.qat import (  # noqa: F401
    QATState, cross_entropy, init_qat_state, make_optimizer, make_schedule,
    make_train_step, merge_quant, partition_quant, quant_trainable_mask,
    reestimate_bn_stats, train_epoch)
