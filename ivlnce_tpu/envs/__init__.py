from ivlnce_tpu.envs import fake_sim, shortest_path, sim_api

__all__ = ["env", "fake_sim", "shortest_path", "sim_api", "vector_env"]


def __getattr__(name):
    # env/vector_env import tasks.* (which import envs.shortest_path);
    # load them lazily to keep the package import acyclic
    if name in ("env", "vector_env"):
        import importlib

        return importlib.import_module(f"ivlnce_tpu.envs.{name}")
    raise AttributeError(name)
