from bridgelang_tpu.serving.server import VLAServer, client_act

__all__ = ["VLAServer", "client_act"]
