"""botocore stub (see boto3.py)."""
