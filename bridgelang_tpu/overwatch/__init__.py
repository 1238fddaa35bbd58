from bridgelang_tpu.overwatch.overwatch import Overwatch, initialize_overwatch

__all__ = ["Overwatch", "initialize_overwatch"]
