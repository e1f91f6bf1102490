from .metrics import StreamSegMetrics, AverageMeter
