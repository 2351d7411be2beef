"""Model definitions: VGG16 trunks, RPN head, MV3D fusion detector."""
