from ofasys_tpu.adaptor.base import AdaptorOutput, BaseAdaptor, BaseAdaptorConfig
from ofasys_tpu.adaptor.general import GeneralAdaptor
from ofasys_tpu.adaptor import text  # registers "text"
from ofasys_tpu.adaptor import image  # registers image adaptors
from ofasys_tpu.adaptor import audio  # registers audio adaptors
from ofasys_tpu.adaptor import motion  # registers motion_6d
from ofasys_tpu.adaptor import video  # registers video_image_sequence
from ofasys_tpu.adaptor import image_vqgan  # registers image_vqgan

__all__ = ["AdaptorOutput", "BaseAdaptor", "BaseAdaptorConfig", "GeneralAdaptor"]
