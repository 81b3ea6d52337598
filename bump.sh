#!/bin/sh
# bump the patch version everywhere (.bumpversion.cfg lists the files)
bump2version --current-version "$(cat VERSION)" patch
