from tdgp.models.layers import (
    FullyConnected, MappingNetwork, Conv2dLayer, ScalarEncoder1d, FourierEncoder1d,
    normalize_2nd_moment,
)
from tdgp.models.stylegan2 import (
    SynthesisLayer, ToRGBLayer, SynthesisBlock, SynthesisBlocksSequence,
    StyleGAN2Generator, sg2_channel_dict, sg2_num_ws,
)
from tdgp.models.epigraf import Generator, SynthesisNetwork, TriPlaneMLP
from tdgp.models.discriminator import Discriminator
from tdgp.models.camera_adaptor import CameraAdaptor
from tdgp.models.depth_adaptor import DepthAdaptor
