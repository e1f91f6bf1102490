from .conv import conv2d, depthwise_conv2d, torch_conv_padding
from .resize import resize_bilinear, resize_nearest
