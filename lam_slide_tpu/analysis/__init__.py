from lam_slide_tpu.analysis import backbone, decorrelation, features, jsd, msm, tica

__all__ = ["backbone", "decorrelation", "features", "jsd", "msm", "tica"]
