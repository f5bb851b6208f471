from .viz import (
    draw_2d_heatmap,
    draw_mask_tile_singleview_heatmap,
    plot_confusion_matrix_from_data,
    plot_to_numpy_array,
    save_image,
    windowing,
)

__all__ = [
    "draw_2d_heatmap", "draw_mask_tile_singleview_heatmap",
    "plot_confusion_matrix_from_data", "plot_to_numpy_array", "save_image",
    "windowing",
]

