from .metrics import StreamSegMetrics, AverageMeter
from .visualizer import Visualizer, save_val_results, denormalize
