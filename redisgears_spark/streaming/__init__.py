# streaming trigger runtime — populated by triggers.py / retention.py
