"""boto3 stub: imported at module scope by the reference's legacy
file_utils.py (bert/file_utils.py:19) but never exercised offline."""


def client(*args, **kwargs):
    raise RuntimeError("boto3 stub: no network in this environment")


def resource(*args, **kwargs):
    raise RuntimeError("boto3 stub: no network in this environment")
