from bridgelang_tpu.models.vlm import IGNORE_INDEX, PrismaticVLM, VLMConfig
from bridgelang_tpu.models.vla import OpenVLA

__all__ = ["IGNORE_INDEX", "PrismaticVLM", "VLMConfig", "OpenVLA"]
