from smart_quantization_tpu.data.cifar import CIFAR10Data, CIFAR100Data  # noqa: F401
