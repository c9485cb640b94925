#!/bin/sh
python3 -m robosat_tpu.tools "$@"
