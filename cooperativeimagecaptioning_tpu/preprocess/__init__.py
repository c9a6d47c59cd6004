"""Offline preprocessing: vocab/labels (prepro_labels), n-gram document
frequencies (prepro_ngrams), ResNet-101 feature extraction (prepro_feats)."""
