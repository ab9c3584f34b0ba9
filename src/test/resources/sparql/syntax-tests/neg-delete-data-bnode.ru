PREFIX : <http://x/>
DELETE DATA { :s :p _:b }
