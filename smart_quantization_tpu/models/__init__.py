from smart_quantization_tpu.models.resnet import ResNet, resnet18, resnet34, resnet50  # noqa: F401
