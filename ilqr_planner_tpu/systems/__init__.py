"""OCP definitions: dense keypoint specs, residuals, costs, dynamics."""
