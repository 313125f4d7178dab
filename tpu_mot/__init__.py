"""tpu-mot: TPU-native multiple-object tracking.

Public surface (the reference's init/update API and its configuration):

>>> from tpu_mot import MultiTracker, TrackerConfig
>>> mt = MultiTracker(TrackerConfig())
>>> mt.init(frame0, dets0)
>>> tracks = mt.update(frame1, dets1)

Heavy imports (jax et al.) happen lazily on attribute access so
`import tpu_mot` stays cheap for tooling.
"""

__version__ = "0.2.0"

_EXPORTS = {
    "MultiTracker": ("tpu_mot.tracker.api", "MultiTracker"),
    "KCFTracker": ("tpu_mot.tracker.kcf_bank", "KCFTracker"),
    "YoloDetector": ("tpu_mot.models.detector", "YoloDetector"),
    "TrackerConfig": ("tpu_mot.config", "TrackerConfig"),
    "KCFConfig": ("tpu_mot.config", "KCFConfig"),
    "KalmanConfig": ("tpu_mot.config", "KalmanConfig"),
    "YoloSpec": ("tpu_mot.models.yolo", "YoloSpec"),
    "dets_with_classes": ("tpu_mot.models.detector", "dets_with_classes"),
}

__all__ = list(_EXPORTS) + ["__version__"]


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'tpu_mot' has no attribute {name!r}")
