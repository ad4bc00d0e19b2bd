from tdgp.utils.tensor_group import TensorGroup, EasyDict
from tdgp.utils.misc import assert_shape, linear_schedule
