from .show_result import (draw_boxes_on_image, show_result_meshlab,
                          write_obj, write_oriented_bbox)

__all__ = ['write_obj', 'write_oriented_bbox', 'show_result_meshlab',
           'draw_boxes_on_image']
