from ivf_tpu.viz.render import (
    visualize_results,
    visualize_results_on_gradcam,
    find_temp_mask_dots,
    create_image_arrays,
    PlotLearning,
)

__all__ = [
    "visualize_results",
    "visualize_results_on_gradcam",
    "find_temp_mask_dots",
    "create_image_arrays",
    "PlotLearning",
]
