from im23d_tpu.train.shapenet_learner import ShapeNetConfig, ShapeNetLearner

__all__ = ["ShapeNetConfig", "ShapeNetLearner"]
