"""Model families: the from-scratch VGG-19 feature extractor and weight IO."""
