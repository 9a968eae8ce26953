from .decoder import decode_annexb
