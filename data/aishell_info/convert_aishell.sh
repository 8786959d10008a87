#!/bin/bash

ls *.tar.gz | xargs -i tar xf {}