from htd_tpu.models.resnet import ResNet
from htd_tpu.models.fpn import FPN
