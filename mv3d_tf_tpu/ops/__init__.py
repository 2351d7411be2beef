"""TPU-native compute ops: BEV rasterization, IoU, NMS, ROI pooling."""
