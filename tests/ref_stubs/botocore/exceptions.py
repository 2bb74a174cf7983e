"""botocore.exceptions stub: only ClientError is imported
(bert/file_utils.py:21)."""


class ClientError(Exception):
    pass
