"""fewshot_detection_tpu — TPU-native few-shot object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
"Few-shot Object Detection via Feature Reweighting" (ICCV 2019,
reference implementation bingykang/Fewshot_Detection): a darknet-cfg-driven
YOLOv2 meta feature extractor, a reweighting network producing per-class
channel-modulation codes from (image + mask) support examples, an episodic
base-training + few-shot-tuning pipeline over VOC/COCO base/novel splits,
and VOC-protocol mAP evaluation.

External contracts kept from the reference:
  * `.data` key=value config files and darknet `.cfg` block files
  * the darknet binary `.weights` codec (bit-compatible field order)
  * CLI argv shapes of train_meta.py / detect.py / valid_ensemble.py / valid.py
  * `comp4_det_test_<class>.txt` result files and the VOC07 11-point mAP

Internals are TPU-first: immutable model specs compiled to pure init/apply
functions, NHWC layouts, fused conv+BN+leaky, the class-reweighting expansion
expressed as an einsum that never materializes the (B*n_cls) batch, on-device
target building for the region loss, and pjit/shard_map data parallelism over
a JAX device mesh.
"""

__version__ = "0.1.0"
