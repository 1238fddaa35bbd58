from bridgelang_tpu.util.seeding import set_global_seed, root_key

__all__ = ["set_global_seed", "root_key"]
